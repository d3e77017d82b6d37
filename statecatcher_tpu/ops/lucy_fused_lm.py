"""Fused lane-major LucyRNN cell: gate math + both scans in ONE kernel pass,
with a fused backward that emits d_gates directly.

Round-3's gap table (BASELINE.md) shows the non-matmul backward machinery —
reverse-adjoint scan kernels plus the XLA "adjoint reduce/mul" fusions that
turn scan adjoints into d_gates — costing ~344 ms of the 686 ms flagship
dispatch at 77-85 % of HBM peak.  Near-peak *per pass* but structurally
pass-heavy: the split design materializes coefficients, λ planes, and five
f32 adjoint planes in HBM between every stage.

This module removes the passes instead of speeding them up:

  forward  (one kernel): read gates (B,T,7D) once → grouped-RMS gate math
           in registers (reference lucyrnn_triton.py:214-226 semantics,
           same as ops/lucy_pallas.py:lucy_gate_coeffs) → s-scan → tanh →
           h-scan (Hillis-Steele over the time chunk) → write h_all, s_all.
           HBM: 7 plane-reads + 2 plane-writes (vs ~14r+8w split).
  backward (one kernel, reverse time-chunk grid): recompute the gate chain
           from gates (and capture its VJP in-register via jax.vjp), run
           BOTH adjoint recurrences λ_t = g_t + a_{t+1}·λ_{t+1} as suffix
           Hillis-Steele compositions, and apply the captured VJP → write
           d_gates (B,T,7D) directly.  HBM: ~13 plane-reads + 7 writes
           (vs ~30+ split).  No λ, coefficient, or adjoint plane ever
           touches HBM.

Unlike round-1's losing ``pallas-fused`` kernel (4-D (B,T,7,D) gates → a
mandatory retiling pass), the gates here stay in the lane-major (B,T,7·D)
layout the projection matmul writes: each gate is a lane-aligned slice at a
multiple of D (D % 128 == 0), so slicing is free.  The gate bias is applied
in-kernel (the projection returns it unapplied — models/lucyrnn.py:GateProj).

The layout also leaves the (B,T,7D) cotangent exactly where the backward
gate matmuls (wgrad/dgrad) want it.  Selected via
``model.lucyrnn.kernel_impl = "fused-lm"``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6
_LANE = 128


def _gate_chain_res(g7):
    """Raw (biased) gate tiles → scan coefficients + residuals for the
    hand-derived adjoint (`_gate_chain_bwd`).

    Mirrors ops/lucy_pallas.py:lucy_gate_coeffs (reference
    lucyrnn_triton.py:214-226): grouped RMS + sigmoid squashing — expressed
    in rsqrt/multiply form so every normalizer is ONE rsqrt whose powers the
    backward reuses (x/sqrt(x²+ε) costs a sqrt AND a divide on the VPU slow
    path; x·rsqrt(x²+ε) costs one rsqrt, and ∂/∂x = ε·rsqrt³ is multiplies).
    """
    r, z, k, v, h_pre, decay, alpha = g7
    i_rz = jax.lax.rsqrt((r * r + z * z) * 0.5 + _EPS)
    q_kv = (k * k + v * v) * 0.5 + _EPS
    i_kv = jax.lax.rsqrt(q_kv)
    inv_qe = 1.0 / (q_kv + _EPS)
    i_d = jax.lax.rsqrt(decay * decay + _EPS)
    i_a = jax.lax.rsqrt(alpha * alpha + _EPS)
    i_p = jax.lax.rsqrt(h_pre * h_pre + _EPS)
    z_n = jax.nn.sigmoid(z * i_rz)
    d_n = jax.nn.sigmoid(decay * i_d)
    a_n = jax.nn.sigmoid(alpha * i_a)
    h_pre_n = h_pre * i_p
    F = (i_kv * i_kv) * inv_qe          # 1/(q·(q+ε))
    kv = (k * v) * F
    coeffs = (d_n, a_n * kv, z_n, 1.0 - z_n, h_pre_n)
    res = (g7, i_rz, q_kv, F, i_d, i_a, i_p, z_n, d_n, a_n, kv)
    return coeffs, res


def _gate_chain(g7):
    """Coefficients only (forward kernel / mechanical-vjp A/B path)."""
    return _gate_chain_res(g7)[0]


def _gate_chain_bwd(res, cot):
    """Hand-derived closed-form adjoint of `_gate_chain_res`.

    Replaces the in-register ``jax.vjp(_gate_chain)`` (round-4 design): the
    mechanical linearization re-derives each sqrt/divide derivative as fresh
    slow-path VPU ops; here every derivative is expressed through the
    residual rsqrt factors — for u = x·rsqrt(x²+ε), ∂u/∂x = ε·rsqrt³ — so
    the whole adjoint is multiplies/adds on top of the 3 σ′ = σ(1−σ) terms.
    Verified against the mechanical vjp at 1e-6 (tests/test_lucy_fused_lm.py
    ::test_hand_adjoint_matches_vjp)."""
    (r, z, k, v, _h_pre, _decay, _alpha), i_rz, q_kv, F, i_d, i_a, i_p, \
        z_n, d_n, a_n, kv = res
    ca, cb, cah, cbh, cp = cot
    # a_s = σ(decay·i_d):   ∂(decay·i_d)/∂decay = ε·i_d³
    d_decay = ca * (d_n * (1.0 - d_n)) * (_EPS * i_d * i_d * i_d)
    # b_s = a_n·kv
    c_kv = cb * a_n
    d_alpha = (cb * kv) * (a_n * (1.0 - a_n)) * (_EPS * i_a * i_a * i_a)
    # a_h = z_n, bh_c = 1−z_n, z_n = σ(z·i_rz) with i_rz = rsqrt((r²+z²)/2+ε)
    g = (cah - cbh) * (z_n * (1.0 - z_n))
    i_rz3 = (i_rz * i_rz) * i_rz
    d_z = g * (i_rz - (0.5 * (z * z)) * i_rz3)
    d_r = g * ((-0.5) * (z * r) * i_rz3)
    # h_pre_n = h_pre·i_p
    d_h_pre = cp * (_EPS * i_p * i_p * i_p)
    # kv = k·v·F with F = 1/(q(q+ε)):  ∂kv/∂k = v·F·(1 − k²·(2q+ε)·F)
    tF = (2.0 * q_kv + _EPS) * F
    d_k = (c_kv * v) * F * (1.0 - (k * k) * tF)
    d_v = (c_kv * k) * F * (1.0 - (v * v) * tF)
    return (d_r, d_z, d_k, d_v, d_h_pre, d_decay, d_alpha)


def _split_gates(g_tile, bias_tile, D):
    """(C, 7D) bf16 tile + (8, 7D) bias → seven (C, D) f32 gate tiles."""
    out = []
    for i in range(7):
        g = g_tile[:, i * D:(i + 1) * D].astype(jnp.float32)
        out.append(g + bias_tile[0:1, i * D:(i + 1) * D].astype(jnp.float32))
    return tuple(out)


def _prefix_hs(A, Bv, C):
    """Inclusive prefix composition (info flows UP: row t sees t' ≤ t)."""
    row = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0)
    k = 1
    while k < C:
        a_sh = jnp.where(row >= k, pltpu.roll(A, k, 0), 1.0)
        b_sh = jnp.where(row >= k, pltpu.roll(Bv, k, 0), 0.0)
        Bv = A * b_sh + Bv
        A = A * a_sh
        k *= 2
    return A, Bv


def _suffix_hs(A, Bv, C):
    """Inclusive suffix composition (info flows DOWN: row t sees t' ≥ t)."""
    row = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0)
    k = 1
    while k < C:
        a_sh = jnp.where(row < C - k, pltpu.roll(A, C - k, 0), 1.0)
        b_sh = jnp.where(row < C - k, pltpu.roll(Bv, C - k, 0), 0.0)
        Bv = A * b_sh + Bv
        A = A * a_sh
        k *= 2
    return A, Bv


# =========================================================================== #
# Forward
# =========================================================================== #


def _fwd_kernel(C: int, D: int, T: int):
    def kernel(h0_ref, s0_ref, bias_ref, gates_ref,
               h_out_ref, s_out_ref, hc_ref, sc_ref):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            hc_ref[:] = h0_ref[0].astype(jnp.float32)
            sc_ref[:] = s0_ref[0].astype(jnp.float32)

        g7 = _split_gates(gates_ref[0], bias_ref, D)
        a_s, b_s, a_h, bh_c, h_pre_n = _gate_chain(g7)

        if T % C:
            # ragged tail rows hold Mosaic edge-pad garbage → identity maps
            valid = (it * C + jax.lax.broadcasted_iota(
                jnp.int32, (C, D), 0)) < T
            a_s = jnp.where(valid, a_s, 1.0)
            b_s = jnp.where(valid, b_s, 0.0)
            a_h = jnp.where(valid, a_h, 1.0)

        As, Bs = _prefix_hs(a_s, b_s, C)
        s = Bs + As * sc_ref[0:1, :]
        c = jnp.tanh(h_pre_n + s)
        b_h = bh_c * c
        if T % C:
            # mask the PRODUCT: c is NaN-prone on garbage rows
            b_h = jnp.where(valid, b_h, 0.0)
        Ah, Bh = _prefix_hs(a_h, b_h, C)
        h = Bh + Ah * hc_ref[0:1, :]

        h_out_ref[0] = h.astype(h_out_ref.dtype)
        s_out_ref[0] = s.astype(s_out_ref.dtype)
        hc_ref[:] = jnp.broadcast_to(h[C - 1:C, :], hc_ref.shape)
        sc_ref[:] = jnp.broadcast_to(s[C - 1:C, :], sc_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret", "out_dtype"))
def _fused_lm_fwd_impl(gates, bias, h0, s0, chunk: int = 128,
                       interpret: bool = False, out_dtype=None):
    out_dtype = gates.dtype if out_dtype is None else out_dtype
    B, T, G7 = gates.shape
    D = G7 // 7
    assert D % _LANE == 0, f"hidden dim {D} must be a multiple of {_LANE}"
    C = min(chunk, max(8, T))
    grid = (B, -(-T // C))

    h0_t = jnp.broadcast_to(h0[:, None, :], (B, 8, D))
    s0_t = jnp.broadcast_to(s0[:, None, :], (B, 8, D))
    bias_t = jnp.broadcast_to(bias[None, :].astype(jnp.float32), (8, G7))

    init = pl.BlockSpec((1, 8, D), lambda ib, it: (ib, 0, 0),
                        memory_space=pltpu.VMEM)
    h_all, s_all = pl.pallas_call(
        _fwd_kernel(C, D, T),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, D), out_dtype),
            jax.ShapeDtypeStruct((B, T, D), out_dtype),
        ),
        grid=grid,
        in_specs=[
            init, init,
            pl.BlockSpec((8, G7), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, G7), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, C, D), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, D), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, D), jnp.float32),
            pltpu.VMEM((8, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(h0_t, s0_t, bias_t, gates)
    return h_all, s_all


# =========================================================================== #
# Backward
# =========================================================================== #


def _bwd_kernel(C: int, D: int, T: int, nchunks: int, hand_adjoint: bool):
    def kernel(h0_ref, s0_ref, bias_ref, gates_ref,
               s_al_ref, h_al_ref, s_pv_ref, h_pv_ref, gh_ref, gs_ref,
               dg_ref, dh0_ref, ds0_ref, dbias_ref,
               lamh_c, lams_c, ahn_ref, asn_ref):
        it = pl.program_id(1)
        first_chunk = it == nchunks - 1   # earliest in time, processed last

        @pl.when(it == 0)
        def _():
            lamh_c[:] = jnp.zeros_like(lamh_c)
            lams_c[:] = jnp.zeros_like(lams_c)
            ahn_ref[:] = jnp.ones_like(ahn_ref)
            asn_ref[:] = jnp.ones_like(asn_ref)

        g7 = _split_gates(gates_ref[0], bias_ref, D)
        if hand_adjoint:
            (a_s, b_s, a_h, bh_c, h_pre_n), chain_res = _gate_chain_res(g7)
            chain_vjp = lambda cot: (_gate_chain_bwd(chain_res, cot),)
        else:
            (a_s, b_s, a_h, bh_c, h_pre_n), chain_vjp = jax.vjp(
                _gate_chain, g7)

        g_h = gh_ref[0].astype(jnp.float32)
        g_s = gs_ref[0].astype(jnp.float32)
        s_al = s_al_ref[0].astype(jnp.float32)
        h_al = h_al_ref[0].astype(jnp.float32)

        row = jax.lax.broadcasted_iota(jnp.int32, (C, D), 0)
        if T % C:
            # ragged tail rows (only in the chunk processed at it == 0):
            # identity maps + zero cotangents so λ stays 0 through them
            grow = (nchunks - 1 - it) * C + row
            valid = grow < T
            a_h = jnp.where(valid, a_h, 1.0)
            a_s = jnp.where(valid, a_s, 1.0)
            g_h = jnp.where(valid, g_h, 0.0)
            g_s = jnp.where(valid, g_s, 0.0)

        # s_prev/h_prev: global shift by one step.  Row 0 takes the LAST row
        # of the previous-in-time chunk (second HBM view, one block earlier);
        # the very first chunk takes (h0, s0).
        def shifted(al, pv_ref, init_ref):
            up = pltpu.roll(al, 1, 0)                      # row t ← al[t-1]
            boundary = jnp.where(
                first_chunk, init_ref[0, 0:1, :].astype(jnp.float32),
                pv_ref[0, C - 1:C, :].astype(jnp.float32))
            return jnp.where(row == 0, boundary, up)

        s_prev = shifted(s_al, s_pv_ref, s0_ref)
        h_prev = shifted(h_al, h_pv_ref, h0_ref)

        # A'[t] = a[t+1]: in-chunk roll; row C−1 takes row 0 of the LATER
        # chunk (processed before us → saved in scratch).
        def a_shift(a, nref):
            a_up = pltpu.roll(a, C - 1, 0)
            return jnp.where(row == C - 1, nref[0:1, :], a_up)

        a_h_sh = a_shift(a_h, ahn_ref)
        a_s_sh = a_shift(a_s, asn_ref)
        ahn_ref[:] = jnp.broadcast_to(a_h[0:1, :], ahn_ref.shape)
        asn_ref[:] = jnp.broadcast_to(a_s[0:1, :], asn_ref.shape)

        # h-recurrence adjoint: λ_t = g_h_t + a_h_{t+1}·λ_{t+1}
        Ah, Bh = _suffix_hs(a_h_sh, g_h, C)
        lam_h = Bh + Ah * lamh_c[0:1, :]
        lamh_c[:] = jnp.broadcast_to(lam_h[0:1, :], lamh_c.shape)

        c = jnp.tanh(h_pre_n + s_al)
        d_a_h = lam_h * h_prev
        d_bhc = lam_h * c
        d_pre = (lam_h * bh_c) * (1.0 - c * c)

        # s-recurrence adjoint (external g_s + internal path through c)
        gs_eff = g_s + d_pre
        if T % C:
            gs_eff = jnp.where(valid, gs_eff, 0.0)
        As, Bs = _suffix_hs(a_s_sh, gs_eff, C)
        lam_s = Bs + As * lams_c[0:1, :]
        lams_c[:] = jnp.broadcast_to(lam_s[0:1, :], lams_c.shape)

        d_a_s = lam_s * s_prev
        (d_g7,) = chain_vjp((d_a_s, lam_s, d_a_h, d_bhc, d_pre))

        dg = jnp.concatenate(d_g7, axis=1)                  # (C, 7D)
        if T % C:
            # zero the NaN-prone garbage rows: their d_gates writes are
            # OOB-dropped anyway, but they must not poison the in-kernel
            # bias-grad accumulator
            grow7 = (nchunks - 1 - it) * C + jax.lax.broadcasted_iota(
                jnp.int32, (C, 7 * D), 0)
            dg = jnp.where(grow7 < T, dg, 0.0)
        dg_ref[0] = dg.astype(dg_ref.dtype)

        # bias gradient: fold the column-sum into this kernel (the XLA
        # reduce_sum over the materialized d_gates costs a full extra HBM
        # read — measured 7.8 ms/layer/dispatch at the flagship shapes)
        @pl.when(it == 0)
        def _():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dbias_ref[0, 0:1, :] += jnp.sum(dg, axis=0, keepdims=True)

        @pl.when(first_chunk)
        def _():
            dh0 = lam_h[0:1, :] * a_h[0:1, :]
            ds0 = lam_s[0:1, :] * a_s[0:1, :]
            dh0_ref[:] = jnp.broadcast_to(dh0, dh0_ref.shape
                                          ).astype(dh0_ref.dtype)
            ds0_ref[:] = jnp.broadcast_to(ds0, ds0_ref.shape
                                          ).astype(ds0_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("chunk", "interpret", "hand_adjoint"))
def _fused_lm_bwd_impl(gates, bias, h0, s0, h_all, s_all, g_h, g_s,
                       chunk: int = 128, interpret: bool = False,
                       hand_adjoint: bool = True):
    B, T, G7 = gates.shape
    D = G7 // 7
    C = min(chunk, max(8, T))
    nchunks = -(-T // C)
    grid = (B, nchunks)

    h0_t = jnp.broadcast_to(h0[:, None, :], (B, 8, D))
    s0_t = jnp.broadcast_to(s0[:, None, :], (B, 8, D))
    bias_t = jnp.broadcast_to(bias[None, :].astype(jnp.float32), (8, G7))

    init = pl.BlockSpec((1, 8, D), lambda ib, it: (ib, 0, 0),
                        memory_space=pltpu.VMEM)
    rev = lambda w: pl.BlockSpec(
        (1, C, w), lambda ib, it, n=nchunks: (ib, n - 1 - it, 0),
        memory_space=pltpu.VMEM)
    # previous-in-time chunk (clamped at 0; the first chunk overrides its
    # boundary row with h0/s0 so the clamped duplicate is never used)
    prev = pl.BlockSpec(
        (1, C, D),
        lambda ib, it, n=nchunks: (ib, jnp.maximum(n - 2 - it, 0), 0),
        memory_space=pltpu.VMEM)

    dg, dh0, ds0, dbias = pl.pallas_call(
        _bwd_kernel(C, D, T, nchunks, hand_adjoint),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, G7), gates.dtype),
            jax.ShapeDtypeStruct((B, 8, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, G7), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            init, init,
            pl.BlockSpec((8, G7), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            rev(G7),                      # gates
            rev(D), rev(D),               # s_all, h_all aligned
            prev, prev,                   # s_all, h_all previous chunk
            rev(D), rev(D),               # g_h, g_s
        ],
        out_specs=(
            rev(G7),
            pl.BlockSpec((1, 8, D), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, D), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G7), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, D), jnp.float32),
            pltpu.VMEM((8, D), jnp.float32),
            pltpu.VMEM((8, D), jnp.float32),
            pltpu.VMEM((8, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(h0_t, s0_t, bias_t, gates, s_all, h_all, s_all, h_all, g_h, g_s)
    return dg, dh0[:, 0, :], ds0[:, 0, :], jnp.sum(dbias[:, 0, :], axis=0)


# =========================================================================== #
# custom_vjp wrapper
# =========================================================================== #


def _chunk_pair(chunk):
    """chunk spec → (fwd_chunk, bwd_chunk); an int applies to both."""
    if isinstance(chunk, tuple):
        return chunk
    return (chunk, chunk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lucy_cell_fused_lm(gates, bias, h0, s0, chunk=128):
    """Fused lane-major 7-gate cell: (gates (B,T,7D) unbiased, bias (7D),
    h0, s0) → (h_all, s_all).  ``chunk`` is an int or a (fwd, bwd) tuple of
    time-chunk sizes.  No frame-mask support — callers with
    mask_state_updates fall back to the split path (models/lucyrnn.py)."""
    return _fused_lm_fwd_impl(gates, bias, h0, s0, chunk=_chunk_pair(chunk)[0])


def _lm_fwd(gates, bias, h0, s0, chunk):
    h_all, s_all = _fused_lm_fwd_impl(
        gates, bias, h0, s0, chunk=_chunk_pair(chunk)[0])
    return (h_all, s_all), (gates, bias, h0, s0, h_all, s_all)


# A/B switch for tools/profile benchmarks: False restores the round-4
# mechanical jax.vjp chain adjoint inside the bwd kernel.
HAND_ADJOINT = True


def _lm_bwd(chunk, res, cotangents):
    gates, bias, h0, s0, h_all, s_all = res
    g_h, g_s = cotangents
    dg, dh0, ds0, d_bias = _fused_lm_bwd_impl(
        gates, bias, h0, s0, h_all, s_all, g_h, g_s,
        chunk=_chunk_pair(chunk)[1], hand_adjoint=HAND_ADJOINT)
    return (dg, d_bias.astype(bias.dtype), dh0.astype(h0.dtype),
            ds0.astype(s0.dtype))


lucy_cell_fused_lm.defvjp(_lm_fwd, _lm_bwd)
