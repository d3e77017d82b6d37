"""Pallas chunkwise mLSTM kernel (xLSTM matrix-memory recurrence).

The TPU replacement for the reference's Triton ``chunkwise--triton_xl_chunk``
mlstm_kernels selection (reference model.py:216-228, train.py:650-653):
one kernel instance per (batch, head) runs the whole sequence, carrying the
matrix memory (C, n, m) in VMEM across chunks — the inter-chunk state never
round-trips through HBM, and the intra-chunk attention-shaped work
(L×L decay-weighted Q·Kᵀ) runs on the MXU.

Math is identical to ``models/xlstm.py:mlstm_chunkwise`` (the XLA form);
equivalence is pinned by tests/test_xlstm.py.  The backward pass is the XLA
form's autodiff on recomputed activations (flash-style: residuals are the
kernel *inputs*, nothing from the forward is stored), registered via
``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _mlstm_kernel(L: int, q_ref, k_ref, v_ref, ic_ref, lf_ref,
                  c0_ref, n0_ref, m0_ref,
                  h_ref, ct_ref, nt_ref, mt_ref,
                  c_s, n_s, m_s):
    Tp = q_ref.shape[1]
    NC = Tp // L
    c_s[:] = c0_ref[0]
    n_s[:] = n0_ref[0]
    m_s[:] = m0_ref[0]

    rows = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = rows >= cols                                   # causal s ≤ t

    def chunk(c, _):
        sl = pl.ds(c * L, L)
        qc = q_ref[0, sl, :]                             # (L, dqk)
        kc = k_ref[0, sl, :]
        vc = v_ref[0, sl, :]                             # (L, dv)
        ic = ic_ref[0, :, sl]                            # (1, L)
        lf = lf_ref[0, :, sl]                            # (1, L)
        m = m_s[0, 0]

        # cumulative log-forget along the chunk; cumsum has no Mosaic
        # lowering, so run it as a (1,L)·(L,L) lower-triangular matmul
        b = lax.dot_general(
            lf, tri.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (1, L)
        a = ic - b                                       # (1, L)
        bL = b[0, L - 1]
        b_col = b.reshape(L, 1)
        a_col = a.reshape(L, 1)

        # running max of a over s ≤ t, as a masked (L, L) reduction
        a_mat = jnp.where(tri, jnp.broadcast_to(a, (L, L)), _NEG_INF)
        a_runmax = jnp.max(a_mat, axis=1, keepdims=True)  # (L, 1)
        mu = b_col + jnp.maximum(m, a_runmax)             # (L, 1)

        # local decay matrix D[t, s] = b_t + a_s − μ_t  (s ≤ t)
        D = jnp.where(tri, b_col + a - mu, _NEG_INF)
        expD = jnp.exp(D)
        S = lax.dot_general(
            qc, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # (L, L) MXU
        num_local = jnp.dot(S * expD, vc,
                            preferred_element_type=jnp.float32)  # (L, dv)
        nvec_local = jnp.dot(expD, kc,
                             preferred_element_type=jnp.float32)  # (L, dqk)

        scale_prev = jnp.exp(b_col + m - mu)              # (L, 1)
        num_prev = jnp.dot(qc, c_s[:],
                           preferred_element_type=jnp.float32) * scale_prev
        nvec = nvec_local + n_s[:] * scale_prev           # (L, dqk)
        qn = jnp.sum(qc * nvec, axis=1, keepdims=True)    # (L, 1)
        denom = jnp.maximum(jnp.abs(qn), jnp.exp(-mu))
        h_ref[0, sl, :] = (num_local + num_prev) / denom

        # inter-chunk state advance
        a_max = a_runmax[L - 1, 0]
        m_new = jnp.maximum(m + bL, bL + a_max)
        decay = jnp.exp(m + bL - m_new)
        w = jnp.exp(bL + a_col - m_new)                   # (L, 1)
        kw = kc * w
        c_s[:] = decay * c_s[:] + lax.dot_general(
            kw, vc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        n_s[:] = decay * n_s[:] + jnp.sum(kw, axis=0, keepdims=True)
        m_s[:] = jnp.full((1, 1), m_new)     # scalar stores to VMEM unsupported
        return 0

    lax.fori_loop(0, NC, chunk, 0)
    ct_ref[0] = c_s[:]
    nt_ref[0] = n_s[:]
    mt_ref[0] = m_s[:]


def _pallas_forward(q, k, v, i_raw, f_raw, C0, n0, m0,
                    chunk_size: int, gate_soft_cap: float):
    from statecatcher_tpu.models.xlstm import _soft_cap

    B, H, T, dqk = q.shape
    dv = v.shape[-1]
    L = chunk_size
    pad = (-T) % L
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        i_raw = jnp.pad(i_raw, ((0, 0), (0, 0), (0, pad)),
                        constant_values=_NEG_INF)
        f_raw = jnp.pad(f_raw, ((0, 0), (0, 0), (0, pad)),
                        constant_values=30.0)
    Tp = T + pad
    BH = B * H

    q = (q * (dqk ** -0.5)).reshape(BH, Tp, dqk)
    k = k.reshape(BH, Tp, dqk)
    v = v.reshape(BH, Tp, dv)
    # Rank-3 layouts with a singleton middle axis so every block's last two
    # dims equal the array's (Mosaic requires last-two block dims to be
    # (8, 128)-divisible OR full — a (1, Tp) block over (BH, Tp) violates the
    # sublane rule whenever BH > 1).
    i_c = _soft_cap(i_raw, gate_soft_cap).reshape(BH, 1, Tp)
    logf = jax.nn.log_sigmoid(_soft_cap(f_raw, gate_soft_cap)).reshape(BH, 1, Tp)
    C0f = C0.reshape(BH, dqk, dv)
    n0f = n0.reshape(BH, 1, dqk)
    m0f = m0.reshape(BH, 1, 1)

    spec3 = lambda d2, d: pl.BlockSpec((1, d2, d), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    h, C_T, n_T, m_T = pl.pallas_call(
        functools.partial(_mlstm_kernel, L),
        grid=(BH,),
        in_specs=[
            spec3(Tp, dqk), spec3(Tp, dqk), spec3(Tp, dv),
            spec3(1, Tp), spec3(1, Tp),
            spec3(dqk, dv), spec3(1, dqk), spec3(1, 1),
        ],
        out_specs=[
            spec3(Tp, dv),
            spec3(dqk, dv), spec3(1, dqk), spec3(1, 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dv), jnp.float32),
            jax.ShapeDtypeStruct((BH, dqk, dv), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, dqk), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dqk, dv), jnp.float32),
            pltpu.VMEM((1, dqk), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
        ],
    )(q, k, v, i_c, logf, C0f, n0f, m0f)

    h = h.reshape(B, H, Tp, dv)[:, :, :T]
    return (h, C_T.reshape(B, H, dqk, dv), n_T.reshape(B, H, dqk),
            m_T.reshape(B, H))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def mlstm_chunkwise_pallas(q, k, v, i_raw, f_raw, C0, n0, m0,
                           chunk_size: int, gate_soft_cap: float = 15.0):
    """Chunkwise mLSTM with the Pallas forward kernel.

    Forward: one VMEM-resident kernel per (batch, head).  Backward: autodiff
    of the equivalent XLA chunkwise form on recomputed activations (the
    residuals are just the inputs — flash-attention-style rematerialization).
    """
    return _pallas_forward(q, k, v, i_raw, f_raw, C0, n0, m0,
                           chunk_size, gate_soft_cap)


def _fwd(q, k, v, i_raw, f_raw, C0, n0, m0, chunk_size, gate_soft_cap):
    out = _pallas_forward(q, k, v, i_raw, f_raw, C0, n0, m0,
                          chunk_size, gate_soft_cap)
    return out, (q, k, v, i_raw, f_raw, C0, n0, m0)


def _bwd(chunk_size, gate_soft_cap, residuals, cotangents):
    from statecatcher_tpu.models.xlstm import mlstm_chunkwise

    _, vjp_fn = jax.vjp(
        lambda *args: mlstm_chunkwise(*args, chunk_size, gate_soft_cap),
        *residuals,
    )
    return vjp_fn(cotangents)


mlstm_chunkwise_pallas.defvjp(_fwd, _bwd)
