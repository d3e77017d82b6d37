"""RNN-T (transducer) loss — on-device lattice DP, TPU-first formulation.

Replaces warp_rnnt's CUDA alpha-beta kernel (reference train.py:38-42,
model.py:97-105).  The lattice recursion

    α(t,u) = logaddexp(α(t−1,u) + blank(t−1,u),  α(t,u−1) + emit(t,u−1))

is computed as a ``lax.scan`` over T whose per-step U-chain
``x_u = logaddexp(base_u, x_{u−1} + e_{u−1})`` is an associative scan in the
(logaddexp, +) semiring — O(T) sequential steps of O(log U) depth, no
anti-diagonal bookkeeping, everything batched on the VPU.

Two front-ends over the same DP core:

  * ``rnnt_loss(log_probs, ...)`` — takes dense (B, T, U+1, V) log-probs
    (warp_rnnt-parity API; reference model.py:92-105)
  * ``rnnt_loss_fused(...)`` — computes blank/emit columns chunk-by-chunk
    from the joiner inputs under ``jax.checkpoint``, so the (B, T, U+1, V)
    joint tensor never persists in HBM — the TPU-native answer to the memory
    problem warp_rnnt's ``compact`` layout addresses on GPU (reference
    model.py:147-200)

Normalization: mean over batch of per-utterance NLL (warp_rnnt default
reduction="mean").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_NEG_INF = -1e30


def _semiring_combine(x, y):
    """Affine maps in the (logaddexp, +) semiring: s ↦ logaddexp(b, s + a)."""
    a1, b1 = x
    a2, b2 = y
    return a1 + a2, jnp.logaddexp(b1 + a2, b2)


def _chain_over_u(base: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """Solve x_u = logaddexp(base_u, x_{u−1} + e_{u−1}) for u = 0..U.

    base: (B, U+1); e: (B, U) emit scores. Returns x: (B, U+1).
    x_0 = base_0 (no incoming emit edge).
    """
    B, U1 = base.shape
    # a_u = e_{u-1} for u>=1; u=0 has no predecessor: a_0 = -inf (kills carry)
    a = jnp.concatenate([jnp.full((B, 1), _NEG_INF), e], axis=1)
    a_cum, x = lax.associative_scan(_semiring_combine, (a, base), axis=1)
    return x


def rnnt_alphas(
    blank_lp: jnp.ndarray,   # (B, T, U+1) log P(blank | t, u)
    emit_lp: jnp.ndarray,    # (B, T, U)   log P(label_u | t, u)
    t_lens: jnp.ndarray,     # (B,)
) -> jnp.ndarray:
    """Forward lattice.  Returns α at the final processed frame: (B, U+1).

    Frames t ≥ t_lens are frozen so the returned row is α(t_lens−1, ·).
    """
    B, T, U1 = blank_lp.shape

    # t = 0: α(0,u) = cumsum of emit(0, ·) along u
    base0 = jnp.full((B, U1), _NEG_INF).at[:, 0].set(0.0)
    alpha = _chain_over_u(base0, emit_lp[:, 0, :])

    def step(alpha_prev, inp):
        blank_t1, emit_t, t = inp
        # base_u = α(t−1, u) + blank(t−1, u)
        base = alpha_prev + blank_t1
        alpha_t = _chain_over_u(base, emit_t)
        active = (t < t_lens)[:, None]
        alpha_t = jnp.where(active, alpha_t, alpha_prev)
        return alpha_t, None

    ts = jnp.arange(1, T)
    xs = (
        jnp.swapaxes(blank_lp[:, :-1, :], 0, 1),   # blank at t−1
        jnp.swapaxes(emit_lp[:, 1:, :], 0, 1),     # emit at t
        ts,
    )
    alpha_last, _ = lax.scan(step, alpha, xs)
    return alpha_last


def rnnt_nll_from_blank_emit(
    blank_lp: jnp.ndarray,   # (B, T, U+1)
    emit_lp: jnp.ndarray,    # (B, T, U)
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,     # (B,) label lengths (U, not U+1)
) -> jnp.ndarray:
    """Per-example transducer NLL: −[α(T−1, U) + blank(T−1, U)]."""
    B, T, U1 = blank_lp.shape
    alpha_last = rnnt_alphas(blank_lp, emit_lp, t_lens)
    a_final = jnp.take_along_axis(alpha_last, u_lens[:, None], axis=1)[:, 0]
    # blank at (t_lens−1, u_lens)
    t_idx = jnp.maximum(t_lens - 1, 0)
    blank_final = blank_lp[jnp.arange(B), t_idx, u_lens]
    return -(a_final + blank_final)


def blank_emit_from_log_probs(
    log_probs: jnp.ndarray,  # (B, T, U+1, V) log-softmaxed joint
    labels: jnp.ndarray,     # (B, U)
    blank_id: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    blank_lp = log_probs[..., blank_id]                      # (B, T, U+1)
    B, T, U1, V = log_probs.shape
    U = U1 - 1
    lbl = jnp.broadcast_to(labels[:, None, :, None], (B, T, U, 1))
    emit_lp = jnp.take_along_axis(log_probs[:, :, :U, :], lbl, axis=3)[..., 0]
    return blank_lp, emit_lp


def rnnt_loss_per_example(
    log_probs: jnp.ndarray,  # (B, T, U+1, V) — log-softmax applied by caller
    labels: jnp.ndarray,
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    blank_lp, emit_lp = blank_emit_from_log_probs(log_probs, labels, blank_id)
    return rnnt_nll_from_blank_emit(blank_lp, emit_lp, t_lens, u_lens)


def rnnt_loss(
    logits: jnp.ndarray,     # (B, T, U+1, V) raw joint logits
    labels: jnp.ndarray,
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    blank_id: int = 0,
    row_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dense-API transducer loss, float32 log-softmax (reference
    model.py:92-94 casts to float32 for warp_rnnt), mean over batch."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per = rnnt_loss_per_example(log_probs, labels, t_lens, u_lens, blank_id)
    if row_valid is None:
        return jnp.mean(per)
    valid = row_valid.astype(per.dtype)
    return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)


# --------------------------------------------------------------------------- #
# Fused path: blank/emit computed chunkwise from joiner inputs under remat —
# the (B, T, U+1, V) joint never persists in HBM.
# --------------------------------------------------------------------------- #
def rnnt_loss_fused(
    enc_proj: jnp.ndarray,    # (B, T, J) encoder projected to join space
    pred_proj: jnp.ndarray,   # (B, U+1, J) predictor projected to join space
    join_kernel: jnp.ndarray, # (J, V) final joiner projection
    join_bias: jnp.ndarray,   # (V,)
    labels: jnp.ndarray,      # (B, U)
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    blank_id: int = 0,
    row_valid: Optional[jnp.ndarray] = None,
    time_chunk: int = 32,
    return_per: bool = False,
) -> jnp.ndarray:
    """Transducer loss fused with the add-joiner (tanh joint, reference
    model.py:129-145): joint logits exist only inside remat chunks."""
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    U = U1 - 1

    pad_t = (-T) % time_chunk
    if pad_t:
        enc_proj = jnp.pad(enc_proj, ((0, 0), (0, pad_t), (0, 0)))
    n_chunks = (T + pad_t) // time_chunk

    @jax.checkpoint
    def chunk_blank_emit(enc_chunk):
        # enc_chunk: (B, C, J) → joint logits (B, C, U+1, V) — transient.
        # Only the blank and label columns are needed, so normalize those two
        # gathers by logsumexp directly instead of materializing the full
        # (B, C, U+1, V) log-softmax tensor (float32 accumulation as the
        # reference requires of warp_rnnt inputs, model.py:92-94).
        joint = jnp.tanh(enc_chunk[:, :, None, :] + pred_proj[:, None, :, :])
        logits = (
            joint @ join_kernel.astype(joint.dtype) + join_bias.astype(joint.dtype)
        ).astype(jnp.float32)
        log_z = jax.nn.logsumexp(logits, axis=-1)
        blank_lp = logits[..., blank_id] - log_z
        lbl = jnp.broadcast_to(
            labels[:, None, :, None], (B, enc_chunk.shape[1], U, 1)
        )
        emit_lp = (
            jnp.take_along_axis(logits[:, :, :U, :], lbl, axis=3)[..., 0]
            - log_z[:, :, :U]
        )
        return blank_lp, emit_lp

    chunks = enc_proj.reshape(B, n_chunks, time_chunk, J)

    def scan_body(_, enc_chunk):
        return None, chunk_blank_emit(enc_chunk)

    _, (blank_c, emit_c) = lax.scan(scan_body, None, jnp.swapaxes(chunks, 0, 1))
    blank_lp = jnp.swapaxes(blank_c, 0, 1).reshape(B, n_chunks * time_chunk, U1)[:, :T]
    emit_lp = jnp.swapaxes(emit_c, 0, 1).reshape(B, n_chunks * time_chunk, U)[:, :T]

    per = rnnt_nll_from_blank_emit(blank_lp, emit_lp, t_lens, u_lens)
    if row_valid is None:
        loss = jnp.mean(per)
    else:
        valid = row_valid.astype(per.dtype)
        loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return (loss, per) if return_per else loss
