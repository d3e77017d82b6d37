"""LucyRNN "native" variant: 6-gate LayerNorm cell (reference lucyrnn.py).

The reference ships TWO distinct LucyRNN models (SURVEY.md Appendix A.14):
the canonical 7-gate grouped-RMS Triton variant (models/lucyrnn.py here) and
this 6-gate LayerNorm variant (reference lucyrnn.py:8-70):

  u      = LN_in(W_in x)                       # per-layer input projection
  r      = sigmoid(LN_r(W_r u))                # computed but UNUSED (parity)
  z      = sigmoid(LN_z(W_z u))
  kv     = (W_k u) * (W_v u)
  decay  = sigmoid(W_decay u)                      (decay_mode="learned")
         | exp(-lambda_decay * t), t = 0..T-1      (decay_mode="prefix_sum")
  s_t    = decay_t * s_{t-1} + kv_t            # first linear scan
  c_t    = tanh(LN_h(W_h(u_t + s_t)))          # fused_ops=False
         | tanh(LN_h(W_h u_t + s_t))           # fused_ops=True (reference
                                               #   lucyrnn.py:47-54 applies W_h
                                               #   BEFORE adding s in fused mode)
  h_t    = (1 - z_t) * c_t + z_t * h_{t-1}     # second linear scan

TPU-first formulation: both recurrences are first-order linear scans
(ops/scan.py), so the whole layer is gate matmuls on the MXU + elementwise
VPU work + two parallel-in-time scans — no per-timestep Python loop (the
reference's training path runs the h recurrence as an O(T) Python loop,
reference lucyrnn.py:161-166).

Intentional fixes vs the reference (documented deviations, like the
backward-pass fix in models/lucyrnn.py):

* Single-apply semantics.  The reference's parallel training path feeds the
  already-scanned s_all[t] back into the cell as ``s_prev`` (reference
  lucyrnn.py:163-165), which applies ``s = decay*s + kv`` a SECOND time, and
  discards the updated s so the carried s state never advances in training
  mode (``h[l], _ = layer(...)``).  Its own sequential inference path
  (reference lucyrnn.py:172-184) applies the update once and carries s.  We
  implement the self-consistent sequential semantics in parallel form, so
  training == streaming inference.
* decay_mode="prefix_sum" uses the true exponential-decay recurrence
  s_t = exp(-lambda*t) * s_{t-1} + kv_t.  The reference's normalized-cumsum
  realization (reference lucyrnn.py:137-142) divides by the cumulative decay
  weight instead of multiplying, which amplifies OLD contributions by
  1/prod(decay) (exponentially exploding); the sequential path it is meant
  to parallelize is the recurrence above.
* Masks: the reference cell honors masks in the sequential path (reference
  lucyrnn.py:66-68: frozen h and s) but its parallel path crashes on any
  non-None mask (a (B,1,1)x(B,D) broadcast at reference lucyrnn.py:164).
  Here ``mask_state_updates=True`` freezes (h, s) on masked frames in every
  impl, composed exactly into the scan coefficients; False ignores masks.

Weight init parity: orthogonal for every weight matrix (reference
lucyrnn.py:34-37), zero-init output projection (reference lucyrnn.py:85-87).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from statecatcher_tpu.config import LucyRNNConfig
from statecatcher_tpu.ops.scan import linear_scan


def _masked_scan(a, b, s0, frame_mask, impl):
    """linear_scan with masked steps forced to the identity map (a=1, b=0)."""
    if frame_mask is not None:
        m = frame_mask[..., None].astype(a.dtype)
        a = m * a + (1.0 - m)
        b = m * b
    return linear_scan(a, b, s0, impl=impl)


class LucyNativeCell(nn.Module):
    """One 6-gate LayerNorm LucyRNN layer (reference lucyrnn.py:8-70)."""

    hidden_dim: int
    fused_ops: bool = False
    layer_norm: bool = True
    decay_mode: str = "learned"       # "learned" | "prefix_sum"
    lambda_decay: float = 0.001
    kernel_impl: str = "assoc"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _ln(self, name):
        if not self.layer_norm:
            return lambda x: x
        # epsilon=1e-5 matches torch nn.LayerNorm's default
        return nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

    @nn.compact
    def __call__(self, x, h0, s0, frame_mask=None):
        D = self.hidden_dim
        dense = dict(
            kernel_init=nn.initializers.orthogonal(),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        u = self._ln("layernorm_in")(nn.Dense(D, name="input_proj", **dense)(x))

        if self.fused_ops:
            fused = nn.Dense(6 * D, name="W_fused", **dense)(u)
            r_pre, z_pre, k, v, h_pre, decay_logits = jnp.split(fused, 6, axis=-1)
        else:
            r_pre = nn.Dense(D, name="W_r", **dense)(u)
            z_pre = nn.Dense(D, name="W_z", **dense)(u)
            k = nn.Dense(D, name="W_k", **dense)(u)
            v = nn.Dense(D, name="W_v", **dense)(u)
            decay_logits = nn.Dense(D, name="W_decay", **dense)(u)

        r = jax.nn.sigmoid(self._ln("layernorm_r")(r_pre))
        del r  # computed by the reference cell but unused in the recurrence
        z = jax.nn.sigmoid(self._ln("layernorm_z")(z_pre))
        kv = k * v

        if self.decay_mode == "learned":
            decay = jax.nn.sigmoid(decay_logits)
        elif self.decay_mode == "prefix_sum":
            # Positional decay exp(-lambda*t), t indexed within the segment
            # (reference lucyrnn.py:126-131; resets at segment boundaries).
            T = x.shape[1]
            t_idx = jnp.arange(T, dtype=jnp.promote_types(kv.dtype, jnp.float32))
            decay = jnp.exp(-self.lambda_decay * t_idx).astype(kv.dtype)
            decay = jnp.broadcast_to(decay[None, :, None], kv.shape)
        else:
            raise ValueError(f"Unknown decay_mode: {self.decay_mode!r}")

        s_all = _masked_scan(decay, kv, s0, frame_mask, self.kernel_impl)

        if self.fused_ops:
            c = jnp.tanh(self._ln("layernorm_h")(h_pre + s_all))
        else:
            c = jnp.tanh(
                self._ln("layernorm_h")(nn.Dense(D, name="W_h", **dense)(u + s_all))
            )

        h_all = _masked_scan(z, (1.0 - z) * c, h0, frame_mask, self.kernel_impl)
        return h_all, h_all[:, -1, :], s_all[:, -1, :]


class LucyNativeEncoder(nn.Module):
    """Stacked 6-gate LucyRNN with zero-init vocab projection (reference
    lucyrnn.py:72-191).  Unlike the Triton variant there is no inter-layer
    LayerNorm, no multi-track stack, and no merge projection — each cell
    carries its own internal LayerNorms.

    State pytree: ``{"h": (B, L, D), "s": (B, L, D)}`` (batch-major).
    """

    input_dim: int
    vocab_size: int
    cfg: LucyRNNConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def init_state(self, batch_size: int) -> dict:
        L, D = self.cfg.num_layers, self.cfg.hidden_dim
        return {
            "h": jnp.zeros((batch_size, L, D), self.dtype),
            "s": jnp.zeros((batch_size, L, D), self.dtype),
        }

    @nn.compact
    def __call__(self, x, state=None, frame_mask=None):
        B, T, _ = x.shape
        cfg = self.cfg
        if state is None:
            state = self.init_state(B)
        cell_mask = frame_mask if cfg.mask_state_updates else None

        x_t = x
        h_layers = []
        s_layers = []
        for l in range(cfg.num_layers):
            x_t, h_T, s_T = LucyNativeCell(
                hidden_dim=cfg.hidden_dim,
                fused_ops=cfg.fused_ops,
                layer_norm=cfg.layer_norm,
                decay_mode=cfg.decay_mode,
                lambda_decay=cfg.lambda_decay,
                kernel_impl=cfg.kernel_impl,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer{l}",
            )(
                x_t,
                state["h"][:, l].astype(self.dtype),
                state["s"][:, l].astype(self.dtype),
                cell_mask,
            )
            h_layers.append(h_T)
            s_layers.append(s_T)

        logits = nn.Dense(
            self.vocab_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="output_proj",
        )(x_t)

        new_state = {
            "h": jnp.stack(h_layers, axis=1),  # (B, L, D)
            "s": jnp.stack(s_layers, axis=1),
        }
        return logits, new_state
