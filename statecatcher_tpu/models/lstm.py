"""LSTM encoder via ``lax.scan`` — the CPU-runnable baseline config.

Replaces the reference's cuDNN ``nn.LSTM`` (reference model.py:203-212).
TPU-first shape: the input-side gate projection for the whole segment is one
big (B·T, Din)×(Din, 4H) MXU matmul hoisted out of the scan; the scan body
only does the (B, H)×(H, 4H) hidden matmul per step.

Masking follows cuDNN packed-sequence semantics (reference model.py:350-372):
masked steps freeze (h, c) and zero the output, so the carried final state is
the state at each utterance's last valid frame.

Parameter layout/init parity with ``torch.nn.LSTM``: per-layer ``w_ih``
(4H×Din), ``w_hh`` (4H×H), two bias vectors, all init U(−1/√H, 1/√H); gate
order i, f, g, o.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def uniform_init(hidden_size):
    bound = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMLayer(nn.Module):
    hidden_size: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h0, c0, frame_mask=None):
        B, T, Din = x.shape
        H = self.hidden_size
        init = uniform_init(H)
        w_ih = self.param("w_ih", init, (Din, 4 * H), self.param_dtype)
        w_hh = self.param("w_hh", init, (H, 4 * H), self.param_dtype)
        b_ih = self.param("b_ih", init, (4 * H,), self.param_dtype)
        b_hh = self.param("b_hh", init, (4 * H,), self.param_dtype)

        x = x.astype(self.dtype)
        # Hoisted input projection: (B, T, 4H) in one MXU matmul.
        gx = x @ w_ih.astype(self.dtype) + (b_ih + b_hh).astype(self.dtype)

        def step(carry, inp):
            h, c = carry
            gx_t, m_t = inp
            g = gx_t + h @ w_hh.astype(self.dtype)
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            gg = jnp.tanh(gg)
            o = jax.nn.sigmoid(o)
            c_new = f * c + i * gg
            h_new = o * jnp.tanh(c_new)
            if m_t is not None:
                mm = m_t[:, None].astype(h_new.dtype)
                h_new = mm * h_new + (1 - mm) * h
                c_new = mm * c_new + (1 - mm) * c
                y = mm * h_new
            else:
                y = h_new
            return (h_new, c_new), y

        gxT = jnp.swapaxes(gx, 0, 1)                       # (T, B, 4H)
        mT = jnp.swapaxes(frame_mask, 0, 1) if frame_mask is not None else None
        (hT, cT), yT = lax.scan(step, (h0.astype(self.dtype), c0.astype(self.dtype)),
                                (gxT, mT))
        return jnp.swapaxes(yT, 0, 1), hT, cT


class LSTMEncoder(nn.Module):
    """Multi-layer unidirectional LSTM.

    State pytree: ``{"h": (B, L, H), "c": (B, L, H)}`` — batch-major.
    """

    input_dim: int
    hidden_size: int
    num_layers: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def init_state(self, batch_size: int) -> dict:
        return {
            "h": jnp.zeros((batch_size, self.num_layers, self.hidden_size), self.dtype),
            "c": jnp.zeros((batch_size, self.num_layers, self.hidden_size), self.dtype),
        }

    @nn.compact
    def __call__(self, x, state=None, frame_mask=None):
        B = x.shape[0]
        if state is None:
            state = self.init_state(B)
        hs, cs = [], []
        y = x
        for l in range(self.num_layers):
            y, hT, cT = LSTMLayer(
                hidden_size=self.hidden_size, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layer{l}",
            )(y, state["h"][:, l], state["c"][:, l], frame_mask)
            hs.append(hT)
            cs.append(cT)
        new_state = {"h": jnp.stack(hs, axis=1), "c": jnp.stack(cs, axis=1)}
        return y, new_state
