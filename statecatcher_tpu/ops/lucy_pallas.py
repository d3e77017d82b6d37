"""Pallas TPU kernel for the first-order linear scan  s_t = a_t·s_{t-1} + b_t.

This is the TPU replacement for the reference's per-(b,d) sequential Triton
loops (reference lucyrnn_triton.py:158-244).  Design:

  * grid = (B, D/BD, T/C): batch and hidden-dim blocks are parallel; the
    time axis is the innermost ("arbitrary") grid dimension, with the running
    state carried across time-chunks in a VMEM scratch that persists between
    grid steps on the same core.
  * within a chunk, the scan runs as a Hillis-Steele composition over the C
    sublane rows: log2(C) full-tile (C × BD) VPU passes using ``pltpu.roll``
    — every pass is full-width, VMEM-resident work (unlike a naive
    per-timestep loop which would use 1 of 8 sublanes).
  * the backward pass is the reverse adjoint scan  λ_t = g_t + a_{t+1}·λ_{t+1}
    — itself a linear scan — run through the same kernel on time-flipped
    inputs, plus two elementwise products (``custom_vjp``).  This gives the
    recurrence a real gradient, which the reference's Triton path lacks
    entirely (outputs written outside autograd — SURVEY.md Appendix A.1).

Accumulation is float32 regardless of input dtype (long decay chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _scan_kernel(C: int, BD: int):
    """Kernel body for one (b, d-block, t-chunk) step."""

    def kernel(s0_ref, a_ref, b_ref, out_ref, carry_ref):
        it = pl.program_id(2)

        @pl.when(it == 0)
        def _():
            carry_ref[:] = s0_ref[0].astype(jnp.float32)

        A = a_ref[0].astype(jnp.float32)          # (C, BD)
        Bv = b_ref[0].astype(jnp.float32)         # (C, BD)

        # Hillis-Steele inclusive composition over the C rows.
        k = 1
        while k < C:
            a_sh = pltpu.roll(A, k, 0)
            b_sh = pltpu.roll(Bv, k, 0)
            row = jax.lax.broadcasted_iota(jnp.int32, (C, BD), 0)
            valid = row >= k
            a_sh = jnp.where(valid, a_sh, 1.0)
            b_sh = jnp.where(valid, b_sh, 0.0)
            Bv = A * b_sh + Bv
            A = A * a_sh
            k *= 2

        carry = carry_ref[0:1, :]                  # (1, BD)
        s = Bv + A * carry                         # broadcast over rows
        out_ref[0] = s.astype(out_ref.dtype)
        carry_ref[:] = jnp.broadcast_to(s[C - 1:C, :], (8, BD))

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def _linear_scan_pallas_fwd_impl(a, b, s0, chunk: int = 256):
    B, T, D = a.shape
    C = min(chunk, max(8, T))
    pad_t = (-T) % C
    pad_d = (-D) % _LANE
    if pad_t or pad_d:
        a = jnp.pad(a, ((0, 0), (0, pad_t), (0, pad_d)), constant_values=1.0)
        b = jnp.pad(b, ((0, 0), (0, pad_t), (0, pad_d)))
        s0 = jnp.pad(s0, ((0, 0), (0, pad_d)))
    Tp, Dp = T + pad_t, D + pad_d
    BD = _LANE
    grid = (B, Dp // BD, Tp // C)

    # s0 as (B, 8, D): sublane-aligned block for the carry initialization.
    s0_tiled = jnp.broadcast_to(s0[:, None, :], (B, 8, Dp))

    out = pl.pallas_call(
        _scan_kernel(C, BD),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Dp), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, BD), lambda ib, id_, it: (ib, 0, id_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, BD), lambda ib, id_, it: (ib, it, id_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, BD), lambda ib, id_, it: (ib, it, id_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, BD), lambda ib, id_, it: (ib, it, id_),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, BD), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(s0_tiled, a, b)
    return out[:, :T, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def linear_scan_pallas(a, b, s0):
    """s_t = a_t · s_{t-1} + b_t over axis 1, fused TPU kernel, full VJP."""
    return _linear_scan_pallas_fwd_impl(a, b, s0)


def _fwd(a, b, s0):
    s = _linear_scan_pallas_fwd_impl(a, b, s0)
    return s, (a, s, s0)


def _bwd(res, g):
    a, s, s0 = res
    B, T, D = a.shape
    # λ_t = g_t + a_{t+1} · λ_{t+1}  — reverse scan ≡ forward scan on flipped
    # arrays with the coefficient sequence shifted by one.
    a_rev = jnp.flip(a, axis=1)
    a_shift = jnp.concatenate([jnp.ones((B, 1, D), a.dtype), a_rev[:, :-1]], axis=1)
    g_rev = jnp.flip(g, axis=1)
    lam_rev = _linear_scan_pallas_fwd_impl(
        a_shift, g_rev, jnp.zeros_like(s0)
    )
    lam = jnp.flip(lam_rev, axis=1)
    # s_{t-1} with s_0 = s0 prepended
    s_prev = jnp.concatenate([s0[:, None, :], s[:, :-1]], axis=1)
    da = lam * s_prev
    db = lam
    ds0 = lam[:, 0] * a[:, 0]
    return da.astype(a.dtype), db.astype(a.dtype), ds0.astype(s0.dtype)


linear_scan_pallas.defvjp(_fwd, _bwd)


