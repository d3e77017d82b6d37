"""xLSTM encoder: mLSTM blocks with chunkwise-parallel matrix memory.

Replaces the reference's external NX-AI ``xLSTMLarge`` + Triton
``mlstm_kernels`` dependency (reference model.py:214-229,301-305; kernel
selection flags reference train.py:643-645,650-653) with a from-scratch JAX
implementation of the same architecture family:

  * exponential gating with max-state stabilization (m), matrix memory
    C ∈ R^{dqk×dv}, normalizer n — per head
  * chunkwise-parallel processing: within a chunk of ``chunk_size`` steps the
    computation is attention-shaped (Q·Kᵀ with a log-decay matrix, all MXU
    matmuls); across chunks a short ``lax.scan`` carries (C, n, m) — the
    reference pads sequences to ×64 for the same chunk structure
    (reference model.py:305,340-347)
  * block = pre-norm mLSTM mixer + pre-norm SwiGLU FFN, residual both

Kernel selection (``XLSTMConfig.kernel_impl``, mirroring the reference's
chunkwise_kernel/step_kernel flags, reference train.py:650-653):
"chunkwise" (XLA scan over chunks), "recurrent" (sequential step path —
the step_kernel role), "pallas" (ops/mlstm_pallas.py — VMEM-resident state).

sLSTM: out of scope by reference parity — the reference instantiates
``xLSTMLarge`` (reference model.py:6,214-229), the mLSTM-only architecture;
no sLSTM block is reachable from any reference config.

Carried segment state per block: (C, n, m) — the matrix-memory equivalent of
the reference's per-block state dict, batch-major for DP sharding.

Math (stabilized, chunk j with L steps; per head):
  f̃_t = logsigmoid(f_t),  b_t = Σ_{s≤t} f̃_s,  a_t = ĩ_t − b_t
  inter-chunk:  m' = max(m + b_L, b_L + max_t a_t)
                C' = e^{m+b_L−m'} C + Σ_t e^{b_L+a_t−m'} k_t v_tᵀ   (n' same with k_t)
  intra-chunk:  μ_t = b_t + max(m, max_{s≤t} a_s)
                num_t = e^{b_t+m−μ_t} q_tᵀC + Σ_{s≤t} e^{b_t+a_s−μ_t}(q_t·k_s) v_s
                n⃗_t  = e^{b_t+m−μ_t} n + Σ_{s≤t} e^{b_t+a_s−μ_t} k_s
                h_t  = num_t / max(|q_t·n⃗_t|, e^{−μ_t})
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from statecatcher_tpu.config import XLSTMConfig

_NEG_INF = -1e30


def _soft_cap(x, cap: float):
    """Soft cap (tanh saturation) used on gate pre-activations."""
    if cap <= 0:
        return x
    return cap * jnp.tanh(x / cap)


def mlstm_recurrent(
    q, k, v,            # (B, H, T, dqk/dv)
    i_raw, f_raw,       # (B, H, T)
    C0, n0, m0,         # (B, H, dqk, dv), (B, H, dqk), (B, H)
    gate_soft_cap: float = 15.0,
):
    """Sequential per-timestep stabilized mLSTM (the reference's
    ``step_kernel`` role, reference train.py:650-653).  Exactly the same
    math as the chunkwise form with L=1 — used as the golden recurrence for
    kernel equivalence tests and for step-at-a-time streaming decode.

      m_t = max(logσ(f_t) + m_{t-1}, ĩ_t)
      C_t = e^{logσ(f_t)+m_{t-1}−m_t} C_{t-1} + e^{ĩ_t−m_t} k_t v_tᵀ
      h_t = (q_tᵀ C_t) / max(|q_tᵀ n_t|, e^{−m_t})
    """
    dqk = q.shape[-1]
    q = q * (dqk ** -0.5)
    i_c = _soft_cap(i_raw, gate_soft_cap)
    logf = jax.nn.log_sigmoid(_soft_cap(f_raw, gate_soft_cap))

    def step(carry, inp):
        C, n, m = carry
        qt, kt, vt, it, lft = inp               # (B,H,d*) and (B,H)
        m_new = jnp.maximum(lft + m, it)
        decay = jnp.exp(lft + m - m_new)[..., None]          # (B,H,1)
        write = jnp.exp(it - m_new)[..., None]               # (B,H,1)
        C = decay[..., None] * C + (kt * write)[..., None] * vt[..., None, :]
        n = decay * n + kt * write
        qn = jnp.sum(qt * n, axis=-1)                        # (B,H)
        num = jnp.einsum("bhd,bhdv->bhv", qt, C)
        denom = jnp.maximum(jnp.abs(qn), jnp.exp(-m_new))[..., None]
        return (C, n, m_new), num / denom

    xs = tuple(jnp.moveaxis(x, 2, 0) for x in (q, k, v, i_c, logf))
    (C_T, n_T, m_T), hs = lax.scan(step, (C0, n0, m0), xs)
    return jnp.moveaxis(hs, 0, 2), C_T, n_T, m_T


def mlstm_chunkwise(
    q, k, v,            # (B, H, T, dqk/dv)
    i_raw, f_raw,       # (B, H, T)
    C0, n0, m0,         # (B, H, dqk, dv), (B, H, dqk), (B, H)
    chunk_size: int,
    gate_soft_cap: float = 15.0,
):
    """Chunkwise-parallel stabilized mLSTM.  Returns (h, C_T, n_T, m_T)."""
    B, H, T, dqk = q.shape
    dv = v.shape[-1]
    L = chunk_size
    pad = (-T) % L
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # padded steps: forget gate → keep state (f̃=0 ⇒ sigmoid→1 ⇒ raw=+∞),
        # input gate → no write (ĩ=−∞)
        i_raw = jnp.pad(i_raw, ((0, 0), (0, 0), (0, pad)), constant_values=_NEG_INF)
        f_raw = jnp.pad(f_raw, ((0, 0), (0, 0), (0, pad)), constant_values=30.0)
    Tp = T + pad
    NC = Tp // L

    q = q * (dqk ** -0.5)
    i_c = _soft_cap(i_raw, gate_soft_cap)
    f_c = _soft_cap(f_raw, gate_soft_cap)
    logf = jax.nn.log_sigmoid(f_c)

    def split(x):  # (B,H,Tp,...) → (NC, B, H, L, ...)
        shp = x.shape
        return jnp.moveaxis(
            x.reshape(shp[0], shp[1], NC, L, *shp[3:]), 2, 0
        )

    # (an index-based scan with per-chunk dynamic slices was measured and
    # LOSES: 7024 vs 7352 — the pre-split copy lets XLA pipeline the scan)
    qs, ks, vs = split(q), split(k), split(v)
    is_, lfs = split(i_c), split(logf)

    tri_mask = jnp.tril(jnp.ones((L, L), bool))            # s ≤ t

    def chunk_step(carry, inp):
        C, n, m = carry                                     # (B,H,dqk,dv) (B,H,dqk) (B,H)
        qc, kc, vc, ic, lfc = inp
        b = jnp.cumsum(lfc, axis=-1)                        # (B,H,L)
        a = ic - b                                          # (B,H,L)
        bL = b[..., -1]                                     # (B,H)

        # --- intra-chunk ------------------------------------------------ #
        # MXU matmuls run in the INPUT precision (bf16 under the flagship
        # model dtype — f32 matmuls execute at a fraction of the bf16 MXU
        # rate on TPU) with f32 accumulation; all gating/exp/stabilization
        # math stays f32.
        md = qc.dtype
        f32 = jnp.float32
        mm = lambda spec, x, y: jnp.einsum(
            spec, x, y, preferred_element_type=f32)
        a_runmax = lax.cummax(a, axis=2)                    # max_{s≤t} a_s
        mu = b + jnp.maximum(m[..., None], a_runmax)        # (B,H,L)
        # local decay matrix D[t,s] = b_t + a_s − μ_t (s ≤ t)
        D = b[..., :, None] + a[..., None, :] - mu[..., :, None]
        D = jnp.where(tri_mask[None, None], D, _NEG_INF)
        expD = jnp.exp(D)
        S = mm("bhtd,bhsd->bhts", qc, kc)                   # (B,H,L,L) MXU
        W = S * expD
        num_local = mm("bhts,bhsv->bhtv", W.astype(md), vc)  # (B,H,L,dv)
        nvec_local = mm("bhts,bhsd->bhtd", expD.astype(md), kc)

        scale_prev = jnp.exp(b + m[..., None] - mu)         # (B,H,L)
        num_prev = mm("bhtd,bhdv->bhtv", qc, C.astype(md)) * scale_prev[..., None]
        nvec_prev = n[..., None, :] * scale_prev[..., None]  # (B,H,L,dqk)

        num = num_local + num_prev
        nvec = nvec_local + nvec_prev
        qn = jnp.einsum("bhtd,bhtd->bht", qc.astype(f32), nvec)
        denom = jnp.maximum(jnp.abs(qn), jnp.exp(-mu))
        h = num / denom[..., None]                          # (B,H,L,dv) f32

        # --- inter-chunk state ------------------------------------------ #
        a_max = a_runmax[..., -1]
        m_new = jnp.maximum(m + bL, bL + a_max)
        w_t = jnp.exp(bL[..., None] + a - m_new[..., None])  # (B,H,L)
        kw = kc * w_t[..., None].astype(md)
        C_new = (
            jnp.exp(m + bL - m_new)[..., None, None] * C
            + mm("bhtd,bhtv->bhdv", kw, vc)
        )
        n_new = (
            jnp.exp(m + bL - m_new)[..., None] * n
            + jnp.sum(kw.astype(f32), axis=2)
        )
        # stack h in the model dtype: the scan's dynamic_update_slice
        # stacking of f32 h measured ~60 ms/dispatch (half of it the f32)
        return (C_new, n_new, m_new), h.astype(md)

    (C_T, n_T, m_T), hs = lax.scan(
        chunk_step, (C0, n0, m0), (qs, ks, vs, is_, lfs))
    h = jnp.moveaxis(hs, 0, 2).reshape(B, H, Tp, dv)[:, :, :T]
    return h, C_T, n_T, m_T


class MLSTMLayer(nn.Module):
    """Multi-head mLSTM mixer with output gating + per-head norm."""

    embedding_dim: int
    num_heads: int
    qk_dim_factor: float
    v_dim_factor: float
    chunk_size: int
    gate_soft_cap: float
    kernel_impl: str = "chunkwise"   # auto|chunkwise|recurrent|pallas|fused
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, state):
        B, T, E = x.shape
        H = self.num_heads
        dqk = int(E * self.qk_dim_factor) // H
        dv = int(E * self.v_dim_factor) // H
        impl = self.kernel_impl
        if impl == "auto":
            # fused lane-major Pallas fwd+bwd when the head slices are
            # lane-aligned (measured 9638 vs chunkwise 7504 audio-s/s at the
            # flagship — BASELINE.md round 5); the kernel is a GSPMD-opaque
            # custom call, so TP contexts keep the partitionable XLA form
            from statecatcher_tpu.models.lucyrnn import tp_active

            if (jax.default_backend() == "tpu" and dqk % 128 == 0
                    and dv % 128 == 0 and self.chunk_size % 128 == 0
                    and not tp_active()):
                impl = "fused"
            else:
                impl = "chunkwise"
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )

        q_lane = dense(H * dqk, "q")(x)                    # (B, T, H·dqk)
        k_lane = dense(H * dqk, "k")(x)
        v_lane = dense(H * dv, "v")(x)
        # gate pre-activations; forget bias init positive (long memory at init)
        i_lane = nn.Dense(
            H, dtype=self.dtype, param_dtype=self.param_dtype,
            bias_init=nn.initializers.constant(-10.0), name="igate",
        )(x)
        f_lane = nn.Dense(
            H, dtype=self.dtype, param_dtype=self.param_dtype,
            bias_init=nn.initializers.constant(3.0), name="fgate",
        )(x)

        C0 = state["C"].astype(jnp.float32)
        n0 = state["n"].astype(jnp.float32)
        m0 = state["m"].astype(jnp.float32)

        if impl == "fused":
            # Lane-major fused Pallas fwd+bwd (ops/mlstm_fused.py): q/k/v/h
            # never leave the projection layout — no head transposes, no
            # chunk-split copies, no scan stacking.
            from statecatcher_tpu.ops.mlstm_fused import mlstm_fused

            h, C_T, n_T, m_T = mlstm_fused(
                q_lane, k_lane, v_lane, i_lane, f_lane, C0, n0, m0,
                self.chunk_size, self.gate_soft_cap)
            h = h.astype(self.dtype).reshape(B, T, H, dv)
            h = nn.RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                           name="head_norm")(h)
            o = jax.nn.sigmoid(dense(H * dv, "ogate")(x)).reshape(
                B, T, H, dv)
            y = dense(E, "out_proj")((h * o).reshape(B, T, H * dv))
            new_state = {
                "C": C_T.astype(state["C"].dtype),
                "n": n_T.astype(state["n"].dtype),
                "m": m_T.astype(state["m"].dtype),
            }
            return y, new_state

        q = q_lane.reshape(B, T, H, dqk).transpose(0, 2, 1, 3)
        k = k_lane.reshape(B, T, H, dqk).transpose(0, 2, 1, 3)
        v = v_lane.reshape(B, T, H, dv).transpose(0, 2, 1, 3)
        i_raw = i_lane.transpose(0, 2, 1)
        f_raw = f_lane.transpose(0, 2, 1)
        if impl == "chunkwise":
            # q/k/v stay in the model dtype so the chunk einsums hit the
            # bf16 MXU path (f32 accumulation via preferred_element_type);
            # only the gate pre-activations are promoted.
            qkvif = (q, k, v,
                     i_raw.astype(jnp.float32), f_raw.astype(jnp.float32))
        else:
            qkvif = (
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32),
                i_raw.astype(jnp.float32), f_raw.astype(jnp.float32),
            )
        if impl == "recurrent":
            h, C_T, n_T, m_T = mlstm_recurrent(
                *qkvif, C0, n0, m0, self.gate_soft_cap,
            )
        elif impl == "pallas":
            from statecatcher_tpu.ops.mlstm_pallas import mlstm_chunkwise_pallas

            h, C_T, n_T, m_T = mlstm_chunkwise_pallas(
                *qkvif, C0, n0, m0, self.chunk_size, self.gate_soft_cap,
            )
        elif impl == "chunkwise":
            h, C_T, n_T, m_T = mlstm_chunkwise(
                *qkvif, C0, n0, m0, self.chunk_size, self.gate_soft_cap,
            )
        else:
            raise ValueError(
                f"Unknown xLSTM kernel_impl {impl!r} "
                "(expected auto|chunkwise|recurrent|pallas|fused)"
            )
        h = h.astype(self.dtype)

        # per-head RMS norm, output gate, merge heads
        h = nn.RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                       name="head_norm")(h)
        o = jax.nn.sigmoid(dense(H * dv, "ogate")(x)).reshape(
            B, T, H, dv
        ).transpose(0, 2, 1, 3)
        h = (h * o).transpose(0, 2, 1, 3).reshape(B, T, H * dv)
        y = dense(E, "out_proj")(h)
        new_state = {
            "C": C_T.astype(state["C"].dtype),
            "n": n_T.astype(state["n"].dtype),
            "m": m_T.astype(state["m"].dtype),
        }
        return y, new_state


class SwiGLUFFN(nn.Module):
    embedding_dim: int
    proj_factor: float
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_ff = int(self.embedding_dim * self.proj_factor)
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        return dense(self.embedding_dim, "down")(
            jax.nn.silu(dense(d_ff, "gate")(x)) * dense(d_ff, "up")(x)
        )


class XLSTMEncoder(nn.Module):
    """Stack of mLSTM blocks with input/vocab projections.

    State pytree per block, stacked batch-major:
      {"C": (B, blocks, H, dqk, dv), "n": (B, blocks, H, dqk),
       "m": (B, blocks, H)}
    """

    input_dim: int
    vocab_size: int
    cfg: XLSTMConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _dims(self):
        E = self.cfg.embedding_dim
        H = self.cfg.num_heads
        dqk = int(E * self.cfg.qk_dim_factor) // H
        dv = int(E * self.cfg.v_dim_factor) // H
        return E, H, dqk, dv

    def init_state(self, batch_size: int) -> dict:
        E, H, dqk, dv = self._dims()
        nb = self.cfg.num_blocks
        B = batch_size
        return {
            "C": jnp.zeros((B, nb, H, dqk, dv), self.dtype),
            "n": jnp.zeros((B, nb, H, dqk), self.dtype),
            "m": jnp.zeros((B, nb, H), self.dtype),
        }

    @nn.compact
    def __call__(self, x, state=None, frame_mask=None):
        cfg = self.cfg
        B = x.shape[0]
        if state is None:
            state = self.init_state(B)
        E, H, dqk, dv = self._dims()
        x = nn.Dense(E, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="input_proj")(x)
        new_C, new_n, new_m = [], [], []
        for bi in range(cfg.num_blocks):
            block_state = {
                "C": state["C"][:, bi], "n": state["n"][:, bi], "m": state["m"][:, bi]
            }
            h = nn.RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"block{bi}_norm_mlstm")(x)
            h, block_state = MLSTMLayer(
                embedding_dim=E, num_heads=H,
                qk_dim_factor=cfg.qk_dim_factor, v_dim_factor=cfg.v_dim_factor,
                chunk_size=cfg.chunk_size, gate_soft_cap=cfg.gate_soft_cap,
                kernel_impl=cfg.kernel_impl,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block{bi}_mlstm",
            )(h, block_state)
            x = x + h
            f = nn.RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"block{bi}_norm_ffn")(x)
            ffn_cls = nn.remat(SwiGLUFFN) if cfg.ffn_remat else SwiGLUFFN
            x = x + ffn_cls(
                embedding_dim=E, proj_factor=cfg.ffn_proj_factor,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block{bi}_ffn",
            )(f)
            new_C.append(block_state["C"])
            new_n.append(block_state["n"])
            new_m.append(block_state["m"])

        x = nn.RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                       name="final_norm")(x)
        logits = nn.Dense(
            self.vocab_size, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name="vocab_proj",
        )(x)
        new_state = {
            "C": jnp.stack(new_C, axis=1),
            "n": jnp.stack(new_n, axis=1),
            "m": jnp.stack(new_m, axis=1),
        }
        return logits, new_state


def xlstm_init_carry(cfg: XLSTMConfig, batch_size: int, dtype=jnp.float32) -> dict:
    E = cfg.embedding_dim
    H = cfg.num_heads
    dqk = int(E * cfg.qk_dim_factor) // H
    dv = int(E * cfg.v_dim_factor) // H
    nb = cfg.num_blocks
    B = batch_size
    return {
        "C": jnp.zeros((B, nb, H, dqk, dv), dtype),
        "n": jnp.zeros((B, nb, H, dqk), dtype),
        "m": jnp.zeros((B, nb, H), dtype),
    }
