"""CTC loss — on-device alpha recursion with PyTorch-parity normalization.

The reference uses cuDNN ``nn.CTCLoss(blank=0, zero_infinity=True)`` with
default mean reduction (reference train.py:141-142, consumed at
model.py:68-71).  PyTorch's mean reduction divides each utterance's NLL by
``max(target_len, 1)`` then averages over the batch; ``zero_infinity`` zeroes
non-finite losses (unalignable segments).  Both behaviors are reproduced
here on top of a per-example CTC NLL.

Two NLL implementations, switchable for A/B numerics:
  * "optax"  — optax.ctc_loss (XLA scan over T)
  * "lattice" — our own log-space alpha recursion via ``lax.scan`` with an
    in-step associative shift structure; this is the reference semantics for
    the Pallas kernel and runs anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax

_NEG_INF = -1e30


def _expand_labels(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, U) labels → (B, 2U+1) blank-interleaved CTC path labels."""
    B, U = labels.shape
    ext = jnp.full((B, 2 * U + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def emit_log_probs(log_probs: jnp.ndarray, ext: jnp.ndarray) -> jnp.ndarray:
    """Emission lookup (B,T,V) × (B,S) labels → (B,T,S), as a one-hot matmul.

    ``take_along_axis`` here lowers to a scalar gather on TPU (~175 ms at
    flagship shapes — 60× this einsum, measured in tools/profile_ctc.py);
    the HIGHEST-precision one-hot matmul runs on the MXU, is bit-exact for
    f32 inputs, and its VJP is the transposed matmul instead of a scatter.
    """
    V = log_probs.shape[2]
    onehot = jax.nn.one_hot(ext, V, dtype=log_probs.dtype)      # (B, S, V)
    return jnp.einsum(
        "btv,bsv->bts", log_probs, onehot, precision=lax.Precision.HIGHEST
    )


def ctc_nll_lattice(
    log_probs: jnp.ndarray,    # (B, T, V) log-softmax
    in_lens: jnp.ndarray,      # (B,)
    labels: jnp.ndarray,       # (B, U)
    label_lens: jnp.ndarray,   # (B,)
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-example CTC negative log likelihood via the alpha recursion.

    Log-space forward over the 2U+1 extended label sequence:
      α_t(s) = logp_t(l_s) + logaddexp(α_{t-1}(s), α_{t-1}(s-1),
                                       [α_{t-1}(s-2) if l_s ≠ blank, l_s ≠ l_{s-2}])
    """
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1
    ext = _expand_labels(labels, blank_id)                  # (B, S)
    # Which states allow the skip transition (s-2): non-blank and != label 2 back
    ext_prev2 = jnp.concatenate(
        [jnp.full((B, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1
    )
    allow_skip = (ext != blank_id) & (ext != ext_prev2)     # (B, S)

    # Per-timestep state emission log-probs: (B, T, S)
    emit = emit_log_probs(log_probs, ext)

    alpha0 = jnp.full((B, S), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    has_label = (label_lens > 0)
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(has_label, emit[:, 0, 1], _NEG_INF)
    )

    def shift1(x):
        return jnp.concatenate([jnp.full((B, 1), _NEG_INF), x[:, :-1]], axis=1)

    def shift2(x):
        return jnp.concatenate([jnp.full((B, 2), _NEG_INF), x[:, :-2]], axis=1)

    def step(alpha, inp):
        emit_t, t = inp
        stay = alpha
        adv = shift1(alpha)
        skip = jnp.where(allow_skip, shift2(alpha), _NEG_INF)
        new = jnp.logaddexp(jnp.logaddexp(stay, adv), skip) + emit_t
        # Freeze alpha past each utterance's length so the final read-out
        # happens exactly at t = in_len.
        active = (t < in_lens)[:, None]
        new = jnp.where(active, new, alpha)
        return new, None

    ts = jnp.arange(1, T)
    emit_rest = jnp.swapaxes(emit[:, 1:, :], 0, 1)          # (T-1, B, S)
    alpha_T, _ = lax.scan(step, alpha0, (emit_rest, ts))

    # Final states: S-1 (last blank) and S-2 (last label); for U=0 only state 0.
    last_label_idx = 2 * label_lens - 1                     # (B,)
    last_blank_idx = 2 * label_lens                         # (B,)
    a_label = jnp.where(
        has_label,
        jnp.take_along_axis(alpha_T, jnp.maximum(last_label_idx, 0)[:, None], axis=1)[:, 0],
        _NEG_INF,
    )
    a_blank = jnp.take_along_axis(alpha_T, last_blank_idx[:, None], axis=1)[:, 0]
    return -jnp.logaddexp(a_label, a_blank)


def ctc_nll_optax(log_probs, in_lens, labels, label_lens, blank_id=0):
    B, T, V = log_probs.shape
    U = labels.shape[1]
    logit_pad = (jnp.arange(T)[None, :] >= in_lens[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(U)[None, :] >= label_lens[:, None]).astype(jnp.float32)
    return optax.ctc_loss(log_probs, logit_pad, labels, label_pad, blank_id=blank_id)


def ctc_loss_per_example(
    logits: jnp.ndarray,       # (B, T, V) raw logits (softmax applied here)
    in_lens: jnp.ndarray,
    labels: jnp.ndarray,
    label_lens: jnp.ndarray,
    blank_id: int = 0,
    zero_infinity: bool = True,
    impl: str = "lattice",
) -> jnp.ndarray:
    """Per-example CTC loss, PyTorch-normalized (nll / max(label_len, 1))."""
    # At least f32 for the log-space DP; f64 logits stay f64 (parity tests).
    acc_dtype = jnp.promote_types(logits.dtype, jnp.float32)
    log_probs = jax.nn.log_softmax(logits.astype(acc_dtype), axis=-1)
    if impl == "auto":
        # Pallas lattice kernel on TPU (8.2 ms fwd+bwd at flagship shapes vs
        # optax 15.2 — tools/profile_ctc.py); optax elsewhere (the Pallas
        # kernel would need interpret mode off-TPU).
        impl = "pallas" if jax.default_backend() == "tpu" else "optax"
    if impl == "optax":
        nll = ctc_nll_optax(log_probs, in_lens, labels, label_lens, blank_id)
    elif impl == "lattice":
        nll = ctc_nll_lattice(log_probs, in_lens, labels, label_lens, blank_id)
    elif impl == "pallas":
        from statecatcher_tpu.ops.ctc_pallas import ctc_nll_pallas

        nll = ctc_nll_pallas(log_probs, in_lens, labels, label_lens, blank_id)
    else:
        raise ValueError(f"Unknown CTC impl {impl!r}")
    per = nll / jnp.maximum(label_lens, 1).astype(nll.dtype)
    if zero_infinity:
        per = jnp.where(jnp.isfinite(per) & (per < 1e29), per, 0.0)
    return per


def ctc_loss(
    logits, in_lens, labels, label_lens,
    blank_id: int = 0, zero_infinity: bool = True, impl: str = "lattice",
) -> jnp.ndarray:
    """Batch CTC loss with PyTorch ``nn.CTCLoss`` mean-reduction semantics."""
    return jnp.mean(
        ctc_loss_per_example(
            logits, in_lens, labels, label_lens, blank_id, zero_infinity, impl
        )
    )
