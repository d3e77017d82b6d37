"""Fused lane-major chunkwise mLSTM: forward AND backward Pallas kernels.

Round-4's xLSTM gap table (BASELINE.md) charges ~105 ms/dispatch to
pad/transpose/stacking bookkeeping and ~95 ms to small-tile einsums around
the chunk scan — HBM round-trips the XLA chunkwise form
(models/xlstm.py:mlstm_chunkwise) pays between every stage, and that the
round-3 Pallas kernel (ops/mlstm_pallas.py) only removed for the forward
(its backward re-ran the XLA form, bookkeeping included).

This module removes the passes on both sides:

  layout   q, k, v and h stay in the lane-major (B, T, H·d) layout the
           projections write/consume: each head is a lane-aligned slice at
           a multiple of d (dqk and dv are 128-multiples at flagship), so
           the kernel grid (B, H) reads head tiles directly — no
           (B,T,H,d)→(B,H,T,d) transpose, no (NC,B,H,L,d) chunk-split copy,
           no scan stacking, no pad copy (ragged tails are masked
           in-kernel like ops/lucy_fused_lm.py).
  forward  (one kernel per (b,h)): fori_loop over time chunks; intra-chunk
           decay-weighted Q·Kᵀ attention on the MXU, inter-chunk (C, n, m)
           carried in VMEM scratch.  Math identical to
           models/xlstm.py:mlstm_chunkwise (reference model.py:216-228 via
           NX-AI mlstm_kernels `chunkwise--triton_xl_chunk`).
  backward (one kernel per (b,h)): phase 1 re-runs the cheap inter-chunk
           state recurrence, checkpointing each chunk's ENTRY (C, n, m) in
           VMEM; phase 2 walks chunks in reverse, recomputes each chunk
           step under an in-register ``jax.vjp``, and applies (dh, dC, dn,
           dm) cotangents — emitting dq/dk/dv lane tiles and per-chunk gate
           adjoints directly.  No activation, state, or adjoint plane ever
           touches HBM.

Selected via ``model.xlstm.kernel_impl = "fused"``; equivalence with the
XLA chunkwise form (values and all gradients) is pinned by
tests/test_mlstm_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _chunk_step(qc, kc, vc, ic, lfc, C, n, m, L: int, inv_sqrt_d: float):
    """One chunk of the stabilized chunkwise mLSTM (f32 tiles).

    qc/kc: (L, dqk), vc: (L, dv), ic/lfc: (1, L);
    C: (dqk, dv), n: (1, dqk), m: (1, 1) scalars-as-tiles.
    Returns (h (L, dv), C', n', m').  Differentiable — the backward kernel
    takes its ``jax.vjp`` in-register.
    """
    rows = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = rows >= cols                                     # causal s ≤ t
    m_s = m[0, 0]

    # in-chunk cumulative log-forget: (1,L)·(L,L) lower-tri matmul (cumsum
    # has no Mosaic lowering)
    b = lax.dot_general(
        lfc, tri.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (1, L)
    a = ic - b
    bL = b[0, L - 1]
    b_col = b.reshape(L, 1)
    a_col = a.reshape(L, 1)

    a_mat = jnp.where(tri, jnp.broadcast_to(a, (L, L)), _NEG)
    a_runmax = jnp.max(a_mat, axis=1, keepdims=True)       # (L, 1)
    mu = b_col + jnp.maximum(m_s, a_runmax)

    D = jnp.where(tri, b_col + a - mu, _NEG)
    expD = jnp.exp(D)
    S = lax.dot_general(
        qc, kc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * inv_sqrt_d   # (L, L) MXU
    num_local = jnp.dot(S * expD, vc,
                        preferred_element_type=jnp.float32)  # (L, dv)
    nvec_local = jnp.dot(expD, kc,
                         preferred_element_type=jnp.float32)  # (L, dqk)

    scale_prev = jnp.exp(b_col + m_s - mu)                 # (L, 1)
    num_prev = jnp.dot(qc, C, preferred_element_type=jnp.float32) \
        * (scale_prev * inv_sqrt_d)
    nvec = nvec_local + n * scale_prev
    qn = jnp.sum(qc * nvec, axis=1, keepdims=True) * inv_sqrt_d
    denom = jnp.maximum(jnp.abs(qn), jnp.exp(-mu))
    h = (num_local + num_prev) / denom                     # (L, dv)

    a_max = a_runmax[L - 1, 0]
    m_new = jnp.maximum(m_s + bL, bL + a_max)
    decay = jnp.exp(m_s + bL - m_new)
    w = jnp.exp(bL + a_col - m_new)                        # (L, 1)
    kw = kc * w
    C_new = decay * C + lax.dot_general(
        kw, vc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    n_new = decay * n + jnp.sum(kw, axis=0, keepdims=True)
    return h, C_new, n_new, jnp.full((1, 1), m_new)


def _state_update(kc, vc, ic, lfc, C, n, m, L: int):
    """Inter-chunk state advance only (phase-1 recompute in the backward
    kernel: no S/num/denom matmuls)."""
    rows = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = rows >= cols
    m_s = m[0, 0]
    b = lax.dot_general(
        lfc, tri.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    a = ic - b
    bL = b[0, L - 1]
    a_max = jnp.max(a, axis=1)[0]
    m_new = jnp.maximum(m_s + bL, bL + a_max)
    decay = jnp.exp(m_s + bL - m_new)
    w = jnp.exp(bL + a.reshape(L, 1) - m_new)
    kw = kc * w
    C_new = decay * C + lax.dot_general(
        kw, vc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    n_new = decay * n + jnp.sum(kw, axis=0, keepdims=True)
    return C_new, n_new, jnp.full((1, 1), m_new)


def _masked_chunk_inputs(q_ref, k_ref, v_ref, ic_ref, lf_ref,
                         c, L: int, T: int, Tp: int):
    """Load chunk c's tiles as f32, masking ragged-tail garbage rows: zero
    q/k/v, input gate −∞ (no state write), log-forget 0 (state kept)."""
    sl = pl.ds(c * L, L)
    qc = q_ref[0, sl, :].astype(jnp.float32)
    kc = k_ref[0, sl, :].astype(jnp.float32)
    vc = v_ref[0, sl, :].astype(jnp.float32)
    ic = ic_ref[0, 0, 0:1, sl]                             # (1, L) f32
    lfc = lf_ref[0, 0, 0:1, sl]
    if T % L:
        trow = c * L + lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        valid = trow < T                                   # (L, 1)
        qc = jnp.where(valid, qc, 0.0)
        kc = jnp.where(valid, kc, 0.0)
        vc = jnp.where(valid, vc, 0.0)
        vrow = (L * c + lax.broadcasted_iota(jnp.int32, (1, L), 1)) < T
        ic = jnp.where(vrow, ic, _NEG)
        lfc = jnp.where(vrow, lfc, 0.0)
    return qc, kc, vc, ic, lfc


# =========================================================================== #
# Forward
# =========================================================================== #


def _fwd_kernel(L: int, T: int, Tp: int, inv_sqrt_d: float):
    def kernel(q_ref, k_ref, v_ref, ic_ref, lf_ref, c0_ref, n0_ref, m0_ref,
               h_ref, ct_ref, nt_ref, mt_ref, c_s, n_s, m_s):
        NC = Tp // L
        c_s[:] = c0_ref[0, 0]
        n_s[:] = n0_ref[0, 0]
        m_s[:] = m0_ref[0, 0]

        def chunk(c, _):
            qc, kc, vc, ic, lfc = _masked_chunk_inputs(
                q_ref, k_ref, v_ref, ic_ref, lf_ref, c, L, T, Tp)
            h, C_new, n_new, m_new = _chunk_step(
                qc, kc, vc, ic, lfc, c_s[:], n_s[:], m_s[:], L, inv_sqrt_d)
            h_ref[0, pl.ds(c * L, L), :] = h.astype(h_ref.dtype)
            c_s[:] = C_new
            n_s[:] = n_new
            m_s[:] = m_new
            return 0

        lax.fori_loop(0, NC, chunk, 0)
        ct_ref[0, 0] = c_s[:]
        nt_ref[0, 0] = n_s[:]
        mt_ref[0, 0] = m_s[:]

    return kernel


def _lane_specs(B, H, Tp, dqk, dv, NC):
    """BlockSpecs shared by fwd/bwd: lane-sliced head tiles straight out of
    the (B, Tp, H·d) projection layout."""
    lane = lambda d: pl.BlockSpec((1, Tp, d), lambda b, h: (b, 0, h),
                                  memory_space=pltpu.VMEM)
    gate = pl.BlockSpec((1, 1, 1, Tp), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    state = lambda d2, d: pl.BlockSpec((1, 1, d2, d),
                                       lambda b, h: (b, h, 0, 0),
                                       memory_space=pltpu.VMEM)
    return lane, gate, state


@functools.partial(jax.jit, static_argnames=("chunk", "T", "interpret"))
def _fused_fwd_impl(q, k, v, i_c, logf, C0, n0, m0,
                    chunk: int, T: int, interpret: bool = False):
    B, Tp, Gq = q.shape
    dv_all = v.shape[-1]
    _, H, dqk, dv = C0.shape
    L = min(chunk, Tp)
    NC = Tp // L
    assert Tp % L == 0
    inv_sqrt_d = float(dqk) ** -0.5

    ic4 = i_c.reshape(B, H, 1, Tp)
    lf4 = logf.reshape(B, H, 1, Tp)
    C04 = C0.reshape(B, H, dqk, dv)
    n04 = n0.reshape(B, H, 1, dqk)
    m04 = m0.reshape(B, H, 1, 1)

    lane, gate, state = _lane_specs(B, H, Tp, dqk, dv, NC)
    h, C_T, n_T, m_T = pl.pallas_call(
        _fwd_kernel(L, T, Tp, inv_sqrt_d),
        grid=(B, H),
        in_specs=[
            lane(dqk), lane(dqk), lane(dv), gate, gate,
            state(dqk, dv), state(1, dqk), state(1, 1),
        ],
        out_specs=[
            lane(dv),
            state(dqk, dv), state(1, dqk), state(1, 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, H * dv), q.dtype),
            jax.ShapeDtypeStruct((B, H, dqk, dv), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, dqk), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dqk, dv), jnp.float32),
            pltpu.VMEM((1, dqk), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, ic4, lf4, C04, n04, m04)
    return h, C_T, n_T.reshape(B, H, dqk), m_T.reshape(B, H)


# =========================================================================== #
# Backward
# =========================================================================== #


def _bwd_kernel(L: int, T: int, Tp: int, inv_sqrt_d: float):
    def kernel(q_ref, k_ref, v_ref, ic_ref, lf_ref, c0_ref, n0_ref, m0_ref,
               dh_ref, dct_ref, dnt_ref, dmt_ref,
               dq_ref, dk_ref, dv_ref, dic_ref, dlf_ref,
               dc0_ref, dn0_ref, dm0_ref,
               ccp_s, ncp_s, mcp_s, dc_s, dn_s, dm_s):
        NC = Tp // L

        # phase 1: recompute the inter-chunk state recurrence, storing each
        # chunk's ENTRY state (the h/intra math is skipped — only C,n,m are
        # carried forward)
        ccp_s[0] = c0_ref[0, 0]
        ncp_s[0] = n0_ref[0, 0]
        mcp_s[0] = m0_ref[0, 0]

        def fwd_chunk(c, _):
            _, kc, vc, ic, lfc = _masked_chunk_inputs(
                q_ref, k_ref, v_ref, ic_ref, lf_ref, c, L, T, Tp)
            C_new, n_new, m_new = _state_update(
                kc, vc, ic, lfc, ccp_s[c], ncp_s[c], mcp_s[c], L)

            @pl.when(c < NC - 1)
            def _():
                ccp_s[c + 1] = C_new
                ncp_s[c + 1] = n_new
                mcp_s[c + 1] = m_new
            return 0

        lax.fori_loop(0, NC, fwd_chunk, 0)

        # phase 2: reverse chunk walk under in-register jax.vjp
        dc_s[:] = dct_ref[0, 0]
        dn_s[:] = dnt_ref[0, 0]
        dm_s[:] = dmt_ref[0, 0]

        def bwd_chunk(i, _):
            c = NC - 1 - i
            qc, kc, vc, ic, lfc = _masked_chunk_inputs(
                q_ref, k_ref, v_ref, ic_ref, lf_ref, c, L, T, Tp)
            dh = dh_ref[0, pl.ds(c * L, L), :].astype(jnp.float32)
            if T % L:
                trow = c * L + lax.broadcasted_iota(jnp.int32, (L, 1), 0)
                dh = jnp.where(trow < T, dh, 0.0)

            step = functools.partial(_chunk_step, L=L,
                                     inv_sqrt_d=inv_sqrt_d)
            _, step_vjp = jax.vjp(
                step, qc, kc, vc, ic, lfc, ccp_s[c], ncp_s[c], mcp_s[c])
            dqc, dkc, dvc, dic, dlfc, dC, dn, dm = step_vjp(
                (dh, dc_s[:], dn_s[:], dm_s[:]))

            sl = pl.ds(c * L, L)
            dq_ref[0, sl, :] = dqc.astype(dq_ref.dtype)
            dk_ref[0, sl, :] = dkc.astype(dk_ref.dtype)
            dv_ref[0, sl, :] = dvc.astype(dv_ref.dtype)
            dic_ref[0, 0, 0:1, pl.ds(c * L, L)] = dic
            dlf_ref[0, 0, 0:1, pl.ds(c * L, L)] = dlfc
            dc_s[:] = dC
            dn_s[:] = dn
            dm_s[:] = dm
            return 0

        lax.fori_loop(0, NC, bwd_chunk, 0)
        dc0_ref[0, 0] = dc_s[:]
        dn0_ref[0, 0] = dn_s[:]
        dm0_ref[0, 0] = dm_s[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "T", "interpret"))
def _fused_bwd_impl(q, k, v, i_c, logf, C0, n0, m0,
                    dh, dC_T, dn_T, dm_T,
                    chunk: int, T: int, interpret: bool = False):
    B, Tp, _ = q.shape
    _, H, dqk, dv = C0.shape
    L = min(chunk, Tp)
    NC = Tp // L
    inv_sqrt_d = float(dqk) ** -0.5

    ic4 = i_c.reshape(B, H, 1, Tp)
    lf4 = logf.reshape(B, H, 1, Tp)
    C04 = C0.reshape(B, H, dqk, dv)
    n04 = n0.reshape(B, H, 1, dqk)
    m04 = m0.reshape(B, H, 1, 1)
    dct4 = dC_T.reshape(B, H, dqk, dv)
    dnt4 = dn_T.reshape(B, H, 1, dqk)
    dmt4 = dm_T.reshape(B, H, 1, 1)

    lane, gate, state = _lane_specs(B, H, Tp, dqk, dv, NC)
    outs = pl.pallas_call(
        _bwd_kernel(L, T, Tp, inv_sqrt_d),
        grid=(B, H),
        in_specs=[
            lane(dqk), lane(dqk), lane(dv), gate, gate,
            state(dqk, dv), state(1, dqk), state(1, 1),
            lane(dv), state(dqk, dv), state(1, dqk), state(1, 1),
        ],
        out_specs=[
            lane(dqk), lane(dqk), lane(dv), gate, gate,
            state(dqk, dv), state(1, dqk), state(1, 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, H * dqk), q.dtype),
            jax.ShapeDtypeStruct((B, Tp, H * dqk), k.dtype),
            jax.ShapeDtypeStruct((B, Tp, H * dv), v.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Tp), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, Tp), jnp.float32),
            jax.ShapeDtypeStruct((B, H, dqk, dv), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, dqk), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NC, dqk, dv), jnp.float32),
            pltpu.VMEM((NC, 1, dqk), jnp.float32),
            pltpu.VMEM((NC, 1, 1), jnp.float32),
            pltpu.VMEM((dqk, dv), jnp.float32),
            pltpu.VMEM((1, dqk), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, ic4, lf4, C04, n04, m04, dh, dct4, dnt4, dmt4)
    dq, dk, dv_, dic, dlf, dC0, dn0, dm0 = outs
    return (dq, dk, dv_, dic.reshape(B, H, Tp), dlf.reshape(B, H, Tp),
            dC0, dn0.reshape(B, H, dqk), dm0.reshape(B, H))


# =========================================================================== #
# custom_vjp wrapper
# =========================================================================== #


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def mlstm_fused_lane(q, k, v, i_c, logf, C0, n0, m0, chunk: int, T: int):
    """Fused lane-major chunkwise mLSTM.

    q/k: (B, Tp, H·dqk), v: (B, Tp, H·dv) — the raw projection layout
    (q UNscaled; the 1/√dqk lives in-kernel); i_c/logf: (B, H, Tp)
    soft-capped input gate / log-sigmoid forget (rows ≥ T ignored);
    C0/n0/m0: (B, H, dqk, dv)/(B, H, dqk)/(B, H) f32.  Tp must be a
    multiple of ``chunk``; rows in [T, Tp) are masked in-kernel.
    Returns (h (B, Tp, H·dv) in q.dtype, C_T, n_T, m_T).
    Requires dqk % 128 == 0 and dv % 128 == 0 (lane-aligned head slices).
    """
    return _fused_fwd_impl(q, k, v, i_c, logf, C0, n0, m0,
                           chunk=chunk, T=T)


def _mf_fwd(q, k, v, i_c, logf, C0, n0, m0, chunk, T):
    out = _fused_fwd_impl(q, k, v, i_c, logf, C0, n0, m0, chunk=chunk, T=T)
    return out, (q, k, v, i_c, logf, C0, n0, m0)


def _mf_bwd(chunk, T, res, cot):
    q, k, v, i_c, logf, C0, n0, m0 = res
    dh, dC_T, dn_T, dm_T = cot
    return _fused_bwd_impl(q, k, v, i_c, logf, C0, n0, m0,
                           dh, dC_T, dn_T, dm_T, chunk=chunk, T=T)


mlstm_fused_lane.defvjp(_mf_fwd, _mf_bwd)


def mlstm_fused(q, k, v, i_raw, f_raw, C0, n0, m0,
                chunk_size: int, gate_soft_cap: float = 15.0):
    """Layer-facing entry: lane-major q/k/v (B, T, H·d) straight from the
    projections, gates i_raw/f_raw (B, T, H).  Applies soft-cap /
    log-sigmoid outside the kernel (tiny (B,T,H) elementwise, keeps the
    custom_vjp boundary simple), pads T to a chunk multiple (rows ≥ T are
    masked in-kernel, so the pad VALUES are irrelevant), and slices the
    padded tail back off.  Returns (h (B, T, H·dv), C_T, n_T, m_T).
    """
    from statecatcher_tpu.models.xlstm import _soft_cap

    B, T, _ = q.shape
    L = min(chunk_size, max(8, T))
    pad = (-T) % L
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        i_raw = jnp.pad(i_raw, ((0, 0), (0, pad), (0, 0)))
        f_raw = jnp.pad(f_raw, ((0, 0), (0, pad), (0, 0)))
    i_c = _soft_cap(i_raw.astype(jnp.float32), gate_soft_cap)
    logf = jax.nn.log_sigmoid(
        _soft_cap(f_raw.astype(jnp.float32), gate_soft_cap))
    i_c = i_c.transpose(0, 2, 1)                           # (B, H, Tp)
    logf = logf.transpose(0, 2, 1)
    h, C_T, n_T, m_T = mlstm_fused_lane(
        q, k, v, i_c, logf,
        C0.astype(jnp.float32), n0.astype(jnp.float32),
        m0.astype(jnp.float32), L, T)
    if pad:
        h = h[:, :T]
    return h, C_T, n_T, m_T
