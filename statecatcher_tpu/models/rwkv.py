"""RWKV encoder (v4-style) — parallel-in-time via log-semiring scans.

The reference lists RWKV as planned-only (reference README.md:11,28); this is
a working TPU-native implementation.  The WKV time-mix recurrence

    wkv_t = (num_{t-1} + e^{u+k_t} v_t) / (den_{t-1} + e^{u+k_t})
    num_t = e^{-w} num_{t-1} + e^{k_t} v_t
    den_t = e^{-w} den_{t-1} + e^{k_t}

is computed in log space with running-max stabilization: ``den`` is a
(logaddexp, +)-semiring linear scan with constant per-channel decay −w (the
same associative combine as the RNN-T lattice, ops/rnnt.py), and ``num`` is
two such scans over the positive/negative parts of v (sign-split log-sum).
Everything is parallel-in-time; no per-step Python or lax.scan over T.

Carried segment state per layer: (log_num_p, log_num_n, log_den) at the last
step — batch-major, like every other encoder here.  Block structure: token
shift + time-mix (r,k,v) and channel-mix FFN, pre-LN, residual.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e30


def _semiring_combine(x, y):
    a1, b1 = x
    a2, b2 = y
    return a1 + a2, jnp.logaddexp(b1 + a2, b2)


def _decay_logsum_scan(logb: jnp.ndarray, neg_w: jnp.ndarray, init: jnp.ndarray):
    """Inclusive scan of  L_t = logaddexp(L_{t-1} − w, logb_t)  over axis 1.

    logb: (B, T, D); neg_w: (D,) = −w; init: (B, D) log-initial (−inf = empty).
    """
    B, T, D = logb.shape
    a = jnp.broadcast_to(neg_w[None, None, :], (B, T, D))
    a_cum, l_cum = lax.associative_scan(_semiring_combine, (a, logb), axis=1)
    return jnp.logaddexp(l_cum, a_cum + init[:, None, :])


def wkv_parallel(
    k: jnp.ndarray,        # (B, T, D) keys
    v: jnp.ndarray,        # (B, T, D) values
    w: jnp.ndarray,        # (D,) positive decay
    u: jnp.ndarray,        # (D,) bonus for the current token
    state: tuple,          # (log_num_p, log_num_n, log_den) each (B, D)
):
    """Returns (wkv (B,T,D), new_state)."""
    log_num_p0, log_num_n0, log_den0 = state
    neg_w = -w
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)

    logb_p = k + jnp.log(jnp.maximum(v, 0.0) + 1e-20)
    logb_n = k + jnp.log(jnp.maximum(-v, 0.0) + 1e-20)
    log_num_p = _decay_logsum_scan(logb_p, neg_w, log_num_p0)
    log_num_n = _decay_logsum_scan(logb_n, neg_w, log_num_n0)
    log_den = _decay_logsum_scan(k, neg_w, log_den0)

    # exclusive (state BEFORE step t): shift right, inject the carried state
    def exclusive(x, x0):
        return jnp.concatenate([x0[:, None, :], x[:, :-1, :]], axis=1)

    ep = exclusive(log_num_p, log_num_p0)
    en = exclusive(log_num_n, log_num_n0)
    ed = exclusive(log_den, log_den0)

    bonus = u[None, None, :] + k
    # numerator: num_prev + e^{bonus} v_t  (sign-split, stabilized)
    top_p = jnp.logaddexp(ep, bonus + jnp.log(jnp.maximum(v, 0.0) + 1e-20))
    top_n = jnp.logaddexp(en, bonus + jnp.log(jnp.maximum(-v, 0.0) + 1e-20))
    bot = jnp.logaddexp(ed, bonus)
    wkv = jnp.exp(top_p - bot) - jnp.exp(top_n - bot)
    return wkv, (log_num_p[:, -1], log_num_n[:, -1], log_den[:, -1])


def _token_shift(x, last):
    """x_{t-1} with the carried last frame injected at t=0."""
    return jnp.concatenate([last[:, None, :], x[:, :-1, :]], axis=1)


class RWKVTimeMix(nn.Module):
    dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, state):
        D = self.dim
        mix_k = self.param("mix_k", nn.initializers.constant(0.5), (D,), self.param_dtype)
        mix_v = self.param("mix_v", nn.initializers.constant(0.5), (D,), self.param_dtype)
        mix_r = self.param("mix_r", nn.initializers.constant(0.5), (D,), self.param_dtype)
        # decay init spreads time constants across channels (RWKV convention)
        w = self.param(
            "time_decay",
            lambda key, shape, dt: jnp.linspace(-5.0, 1.0, shape[0]).astype(dt),
            (D,), self.param_dtype,
        )
        u = self.param("time_first", nn.initializers.zeros, (D,), self.param_dtype)

        prev = _token_shift(x, state["last_x"])
        xk = x * mix_k + prev * (1 - mix_k)
        xv = x * mix_v + prev * (1 - mix_v)
        xr = x * mix_r + prev * (1 - mix_r)
        dense = lambda name: nn.Dense(D, use_bias=False, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        k = dense("key")(xk)
        v = dense("value")(xv)
        r = jax.nn.sigmoid(dense("receptance")(xr))

        wkv, (np_, nn_, nd) = wkv_parallel(
            k.astype(jnp.float32), v.astype(jnp.float32),
            jnp.exp(w.astype(jnp.float32)),     # w stored in log; decay = exp(w)>0
            u.astype(jnp.float32),
            (state["log_num_p"], state["log_num_n"], state["log_den"]),
        )
        out = dense("output")(r * wkv.astype(self.dtype))
        new_state = {
            "last_x": x[:, -1, :],
            "log_num_p": np_, "log_num_n": nn_, "log_den": nd,
        }
        return out, new_state


class RWKVChannelMix(nn.Module):
    dim: int
    hidden_mult: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, last_x):
        D = self.dim
        mix_k = self.param("mix_k", nn.initializers.constant(0.5), (D,), self.param_dtype)
        mix_r = self.param("mix_r", nn.initializers.constant(0.5), (D,), self.param_dtype)
        prev = _token_shift(x, last_x)
        xk = x * mix_k + prev * (1 - mix_k)
        xr = x * mix_r + prev * (1 - mix_r)
        k = nn.Dense(D * self.hidden_mult, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="key")(xk)
        r = jax.nn.sigmoid(
            nn.Dense(D, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="receptance")(xr)
        )
        kv = nn.Dense(D, use_bias=False, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="value")(
            jnp.square(jax.nn.relu(k))
        )
        return r * kv, x[:, -1, :]


class RWKVEncoder(nn.Module):
    """RWKV block stack with vocab head and carried per-layer state.

    State pytree (batch-major):
      last_x_tm/last_x_cm: (B, L, D);  log_num_p/log_num_n/log_den: (B, L, D)
    """

    input_dim: int
    vocab_size: int
    dim: int = 512
    num_layers: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def init_state(self, batch_size: int) -> dict:
        B, L, D = batch_size, self.num_layers, self.dim
        return {
            "last_x_tm": jnp.zeros((B, L, D), self.dtype),
            "last_x_cm": jnp.zeros((B, L, D), self.dtype),
            "log_num_p": jnp.full((B, L, D), _NEG, jnp.float32),
            "log_num_n": jnp.full((B, L, D), _NEG, jnp.float32),
            "log_den": jnp.full((B, L, D), _NEG, jnp.float32),
        }

    @nn.compact
    def __call__(self, x, state=None, frame_mask=None):
        B = x.shape[0]
        if state is None:
            state = self.init_state(B)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="input_proj")(x)
        new = {k: [] for k in ("last_x_tm", "last_x_cm", "log_num_p",
                               "log_num_n", "log_den")}
        for l in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"ln_tm{l}")(x)
            tm_state = {
                "last_x": state["last_x_tm"][:, l],
                "log_num_p": state["log_num_p"][:, l],
                "log_num_n": state["log_num_n"][:, l],
                "log_den": state["log_den"][:, l],
            }
            h, tm_new = RWKVTimeMix(
                dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"time_mix{l}",
            )(h, tm_state)
            x = x + h
            f = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"ln_cm{l}")(x)
            f, cm_last = RWKVChannelMix(
                dim=self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"channel_mix{l}",
            )(f, state["last_x_cm"][:, l])
            x = x + f
            new["last_x_tm"].append(tm_new["last_x"])
            new["last_x_cm"].append(cm_last)
            new["log_num_p"].append(tm_new["log_num_p"])
            new["log_num_n"].append(tm_new["log_num_n"])
            new["log_den"].append(tm_new["log_den"])

        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="ln_out")(x)
        logits = nn.Dense(self.vocab_size, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="vocab_proj")(x)
        new_state = {k: jnp.stack(v, axis=1) for k, v in new.items()}
        return logits, new_state


def rwkv_init_carry(dim: int, num_layers: int, batch_size: int, dtype=jnp.float32):
    B, L, D = batch_size, num_layers, dim
    return {
        "last_x_tm": jnp.zeros((B, L, D), dtype),
        "last_x_cm": jnp.zeros((B, L, D), dtype),
        "log_num_p": jnp.full((B, L, D), _NEG, jnp.float32),
        "log_num_n": jnp.full((B, L, D), _NEG, jnp.float32),
        "log_den": jnp.full((B, L, D), _NEG, jnp.float32),
    }
