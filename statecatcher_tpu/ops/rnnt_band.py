"""Banded (pruned) RNN-T: joint + lattice restricted to a per-utterance
diagonal band of the (t, u) plane.

The exact loss is phase-bound on TPU: at U=128 the fused joint runs at 99 %
of the composite VPU-exp floor (BASELINE.md round-3 bound proof —
tools/profile_rnnt_joint.py), so the remaining lever is computing FEWER
exps.  This module restricts u, per time-block, to a width-``band`` window
centered on each utterance's own alignment diagonal u ≈ t·u_len/t_len
(k2-style pruning, but with a closed-form band instead of a trivial-joiner
search), cutting the T×U×V softmax work by ~U/band.

Correctness contract: the result is the exact log-sum over all IN-BAND
monotone paths (a lower bound on the full likelihood).  The band always
contains each utterance's corner (t_len−1, u_len) by construction, and with
``band ≥ U+1`` the band covers everything and the loss equals the exact one
(pinned by tests/test_rnnt_band.py).  The reference computes the full
lattice (warp_rnnt, reference model.py:97-105) — this is strictly more work
saved, not a parity requirement.

Layout: banded blank/emit tensors are (B, Tp, Wp) with a per-(b, time-block)
band start array ``o`` (8-aligned, non-decreasing in t); the Pallas joint
slices the prediction rows at ``o[b, block]`` via scalar prefetch, and the
XLA lattice scan realigns the α window with cheap static-roll selects at
block boundaries (Δo is a small multiple of 8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from statecatcher_tpu.ops.rnnt import _chain_over_u
from statecatcher_tpu.ops.rnnt_pallas import _joint_tile, _round_up

_NEG_INF = -1e30
_LANE = 128


def band_offsets(t_lens, u_lens, Tp: int, U1p: int, Wp: int, time_block: int):
    """Per-(utterance, time-block) band starts: 8-aligned, clipped,
    non-decreasing, corner-covering.  Returns (B, nblocks) int32."""
    nblocks = Tp // time_block
    # center the band on the diagonal at each block's END (the block shares
    # one offset, so anchoring at the end keeps the in-block drift inside)
    tb_end = ((jnp.arange(nblocks) + 1) * time_block).astype(jnp.float32)
    slope = u_lens.astype(jnp.float32) / jnp.maximum(
        t_lens.astype(jnp.float32), 1.0)
    center = tb_end[None, :] * slope[:, None]              # (B, nblocks)
    o = jnp.clip(jnp.round(center - Wp / 2), 0.0, float(U1p - Wp))
    o = (o.astype(jnp.int32) // 8) * 8
    # hard corner guarantee: at each utterance's LAST block, the band must
    # contain u_len (rounding/clipping above can push it out by a few rows)
    blk = jnp.arange(nblocks)[None, :]
    last_blk = jnp.maximum(t_lens - 1, 0)[:, None] // time_block
    lo_req = jnp.clip(((u_lens - Wp + 8) // 8) * 8, 0, U1p - Wp)[:, None]
    hi_req = jnp.clip((u_lens // 8) * 8, 0, U1p - Wp)[:, None]
    o = jnp.where(blk == last_blk, jnp.clip(o, lo_req, hi_req), o)
    # every path starts at (0, 0): block 0 must contain u = 0 (with more
    # than Wp tokens inside the first block the band is degenerate and the
    # loss correctly prunes to −inf)
    o = o.at[:, 0].set(0)
    # monotone non-decreasing (the DP realignment assumes δ ≥ 0), then
    # freeze past the last frame so the final α row keeps its coordinates
    o = lax.cummax(o, axis=1)
    o_last = jnp.take_along_axis(o, last_blk, axis=1)
    o = jnp.where(blk > last_blk, o_last, o)
    return o


# --------------------------------------------------------------------------- #
# Banded fused joint (Pallas)
# --------------------------------------------------------------------------- #


def _fwd_kernel(Tb, Wp, blank_id, bias_lane, mm_dtype):
    def kernel(o_ref, enc_ref, pred_ref, k_ref, ke_ref, blank_ref, emit_ref):
        ib, it = pl.program_id(0), pl.program_id(1)
        o = pl.multiple_of(o_ref[ib, it], 8)
        enc = enc_ref[0].astype(jnp.float32)
        pred = pred_ref[0, pl.ds(o, Wp), :].astype(jnp.float32)
        joint, logits = _joint_tile(enc, pred, k_ref, bias_lane, mm_dtype)
        m = jnp.max(logits, axis=1, keepdims=True)
        log_z = (
            m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
        ).reshape(Tb, Wp)
        blank_logit = logits.reshape(Tb, Wp, -1)[:, :, blank_id]
        ke = ke_ref[0, pl.ds(o, Wp), :].astype(jnp.float32)
        emit_logit = jnp.sum(joint * ke[None, :, :], axis=2)
        blank_ref[0] = blank_logit - log_z
        emit_ref[0] = emit_logit - log_z

    return kernel


def _bwd_kernel(Tb, Wp, blank_id, bias_lane, mm_dtype):
    def kernel(o_ref, enc_ref, pred_ref, k_ref, oh_ref, gb_ref, ge_ref,
               denc_ref, dpred_ref, dk_ref):
        ib, it = pl.program_id(0), pl.program_id(1)
        o = pl.multiple_of(o_ref[ib, it], 8)
        enc = enc_ref[0].astype(jnp.float32)
        pred = pred_ref[0, pl.ds(o, Wp), :].astype(jnp.float32)
        joint, logits = _joint_tile(enc, pred, k_ref, bias_lane, mm_dtype)
        V = logits.shape[1]
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(Tb, Wp, V)

        g_b = gb_ref[0].astype(jnp.float32)            # (Tb, Wp)
        g_e = ge_ref[0].astype(jnp.float32)
        oh = oh_ref[0, pl.ds(o, Wp), :].astype(jnp.float32)   # (Wp, V)
        v_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, V), 2)
        blank_oh = (v_ids == blank_id).astype(jnp.float32)
        dlog = (
            g_b[:, :, None] * blank_oh
            + g_e[:, :, None] * oh[None, :, :]
            - (g_b + g_e)[:, :, None] * p
        ).reshape(Tb * Wp, V)

        dj = jax.lax.dot_general(
            dlog.astype(mm_dtype), k_ref[:].astype(mm_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(Tb, Wp, -1) * (1.0 - jnp.square(joint))

        denc_ref[0] = jnp.sum(dj, axis=1)

        @pl.when(it == 0)
        def _():
            dpred_ref[0] = jnp.zeros_like(dpred_ref[0])

        dpred_ref[0, pl.ds(o, Wp), :] += jnp.sum(dj, axis=0)

        @pl.when(jnp.logical_and(ib == 0, it == 0))
        def _():
            dk_ref[:] = jnp.zeros_like(dk_ref[:])

        j2 = joint.reshape(Tb * Wp, joint.shape[2])
        dk_ref[:] += jax.lax.dot_general(
            j2.astype(mm_dtype), dlog.astype(mm_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _banded_core(o, encp, predp, kp, ke, oh, cfg):
    return _banded_fwd_impl(o, encp, predp, kp, ke, cfg,
                            interpret=_INTERPRET[0])


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _banded_fwd_impl(o, encp, predp, kp, ke, cfg, interpret: bool = False):
    blank_id, bias_lane, Tb, Wp, mm_dtype_name = cfg
    mm_dtype = jnp.dtype(mm_dtype_name)
    B, Tp, Jp = encp.shape
    U1p = predp.shape[1]
    Vp = kp.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Tp // Tb),
        in_specs=[
            pl.BlockSpec((1, Tb, Jp), lambda ib, it, o_: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Jp), lambda ib, it, o_: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, Vp), lambda ib, it, o_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Jp), lambda ib, it, o_: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Tb, Wp), lambda ib, it, o_: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, Wp), lambda ib, it, o_: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        _fwd_kernel(Tb, Wp, blank_id, bias_lane, mm_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, Wp), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(o, encp, predp, kp, ke)


def _banded_core_fwd(o, encp, predp, kp, ke, oh, cfg):
    out = _banded_fwd_impl(o, encp, predp, kp, ke, cfg,
                           interpret=_INTERPRET[0])
    return out, (o, encp, predp, kp, ke, oh)


_INTERPRET = [False]  # test hook (CPU interpret mode)


def _banded_core_bwd(cfg, res, g):
    blank_id, bias_lane, Tb, Wp, mm_dtype_name = cfg
    mm_dtype = jnp.dtype(mm_dtype_name)
    o, encp, predp, kp, ke, oh = res
    g_blank, g_emit = g
    B, Tp, Jp = encp.shape
    U1p = predp.shape[1]
    Vp = kp.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Tp // Tb),
        in_specs=[
            pl.BlockSpec((1, Tb, Jp), lambda ib, it, o_: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Jp), lambda ib, it, o_: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, Vp), lambda ib, it, o_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Vp), lambda ib, it, o_: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, Wp), lambda ib, it, o_: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, Wp), lambda ib, it, o_: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Tb, Jp), lambda ib, it, o_: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Jp), lambda ib, it, o_: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, Vp), lambda ib, it, o_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    denc, dpred, dk = pl.pallas_call(
        _bwd_kernel(Tb, Wp, blank_id, bias_lane, mm_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, Jp), jnp.float32),
            jax.ShapeDtypeStruct((B, U1p, Jp), jnp.float32),
            jax.ShapeDtypeStruct((Jp, Vp), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET[0],
    )(o, encp, predp, kp, oh, g_blank, g_emit)
    import numpy as np

    return (
        np.zeros(o.shape, jax.dtypes.float0),   # o: int32, float0 cotangent
        denc.astype(encp.dtype),
        dpred.astype(predp.dtype),
        dk.astype(kp.dtype),
        jnp.zeros_like(ke),                     # derived view
        jnp.zeros_like(oh),                     # derived view
    )


_banded_core.defvjp(_banded_core_fwd, _banded_core_bwd)


def joint_blank_emit_banded(enc_p, pred_p, join_kernel, join_bias, labels, o,
                            Wp: int, blank_id: int = 0, time_block: int = 8):
    """Banded fused joint.  Returns (blank_b, emit_b): (B, Tp, Wp) f32 where
    row w of time-block blk corresponds to global u = o[b, blk] + w."""
    B, T, J = enc_p.shape
    U1 = pred_p.shape[1]
    U = U1 - 1
    V = join_kernel.shape[1]
    Jp = _round_up(J + 1, _LANE)
    U1p = _round_up(max(U1, Wp), 8)
    Tp = _round_up(T, time_block)
    Vp = _round_up(V, _LANE)

    encp = jnp.pad(enc_p, ((0, 0), (0, Tp - T), (0, Jp - J)))
    predp = jnp.pad(pred_p, ((0, 0), (0, U1p - U1), (0, Jp - J)))
    kp = jnp.zeros((Jp, Vp), join_kernel.dtype)
    kp = kp.at[:J, :V].set(join_kernel)
    kp = kp.at[J, :V].set(join_bias.astype(join_kernel.dtype))
    if Vp > V:
        kp = kp.at[J, V:].set(-1e30)
    oh = jax.nn.one_hot(labels, Vp, dtype=jnp.bfloat16)
    oh = jnp.pad(oh, ((0, 0), (0, U1p - U), (0, 0)))
    ke = jnp.swapaxes(
        jnp.take(jax.lax.stop_gradient(kp), labels, axis=1), 0, 1
    ).swapaxes(1, 2)
    ke = jnp.pad(ke, ((0, 0), (0, U1p - U), (0, 0)))

    mm_dtype = jnp.bfloat16 if enc_p.dtype == jnp.bfloat16 else jnp.float32
    cfg = (blank_id, J, time_block, Wp, jnp.dtype(mm_dtype).name)
    return _banded_core(o, encp, predp, kp, ke, oh, cfg)


# --------------------------------------------------------------------------- #
# Banded lattice DP (XLA scan)
# --------------------------------------------------------------------------- #


def _shift_band(x, delta, Wp):
    """Realign the α window: out[w] = x[w + δ] (δ ≥ 0, multiple of 8)."""
    B = x.shape[0]
    out = jnp.full_like(x, _NEG_INF)
    for k in range(Wp // 8 + 1):
        if 8 * k == 0:
            cand = x
        else:
            cand = jnp.concatenate(
                [x[:, 8 * k:], jnp.full((B, 8 * k), _NEG_INF, x.dtype)], 1)
        out = jnp.where(delta[:, None] == 8 * k, cand, out)
    return out


def rnnt_nll_banded(blank_b, emit_b, o, t_lens, u_lens, time_block: int):
    """Per-utterance NLL over in-band paths.

    blank_b/emit_b: (B, Tp, Wp) banded tables; o: (B, nblocks) band starts.
    """
    B, Tp, Wp = blank_b.shape
    # per-step band offsets and realignment deltas
    blk_of_t = jnp.arange(Tp) // time_block
    o_t = o[:, blk_of_t]                                   # (B, Tp)
    delta = jnp.concatenate(
        [jnp.zeros((B, 1), o.dtype), o_t[:, 1:] - o_t[:, :-1]], axis=1)

    base0 = jnp.full((B, Wp), _NEG_INF).at[:, 0].set(0.0)  # o(b,0) == 0
    alpha = _chain_over_u(base0, emit_b[:, 0, :-1])

    def step(alpha_prev, inp):
        blank_t1, emit_t, delta_t, t = inp
        base = alpha_prev + blank_t1
        base = _shift_band(base, delta_t, Wp)
        alpha_t = _chain_over_u(base, emit_t[:, :-1])
        active = (t < t_lens)[:, None]
        return jnp.where(active, alpha_t, alpha_prev), None

    xs = (
        jnp.moveaxis(blank_b[:, :-1], 1, 0),               # blank(t−1)
        jnp.moveaxis(emit_b[:, 1:], 1, 0),                 # emit(t)
        jnp.moveaxis(delta[:, 1:], 1, 0),
        jnp.arange(1, Tp),
    )
    alpha_final, _ = lax.scan(step, alpha, xs)

    # corner read in frozen coordinates: w* = u_len − o(b, block(t_len−1))
    t_last = jnp.maximum(t_lens - 1, 0)
    o_fin = jnp.take_along_axis(o_t, t_last[:, None], axis=1)[:, 0]
    w_raw = u_lens - o_fin
    w_star = jnp.clip(w_raw, 0, Wp - 1)
    blank_fin = jnp.take_along_axis(
        blank_b, t_last[:, None, None], axis=1)[:, 0]       # (B, Wp)
    a_corner = jnp.take_along_axis(alpha_final, w_star[:, None], axis=1)[:, 0]
    b_corner = jnp.take_along_axis(blank_fin, w_star[:, None], axis=1)[:, 0]
    # Degenerate guard: when the band never contained the corner (e.g.
    # u_len ≥ Wp with t_len inside block 0, where the path-start constraint
    # pins o=0), the clip above would silently read the WRONG cell — return
    # the pruned-everything sentinel instead so callers can mask the row.
    covered = (w_raw >= 0) & (w_raw < Wp)
    return jnp.where(covered, -(a_corner + b_corner), -_NEG_INF)


def rnnt_loss_banded(
    enc_proj, pred_proj, join_kernel, join_bias, labels,
    t_lens, u_lens, blank_id: int = 0, row_valid=None,
    time_block: int = 8, band: int = 48, return_per: bool = False,
):
    """Banded transducer loss (mean over valid rows, warp_rnnt parity norm).

    ``band`` is the requested window width in u; the realized width is
    rounded up for sublane alignment + in-block diagonal drift."""
    B, T, _ = enc_proj.shape
    U1 = pred_proj.shape[1]
    Wp = _round_up(min(band + 8 + time_block, U1 + 8), 8)
    Tp = _round_up(T, time_block)
    U1p = _round_up(max(U1, Wp), 8)
    o = band_offsets(t_lens, u_lens, Tp, U1p, Wp, time_block)
    blank_b, emit_b = joint_blank_emit_banded(
        enc_proj, pred_proj, join_kernel, join_bias, labels, o, Wp,
        blank_id=blank_id, time_block=time_block)
    per = rnnt_nll_banded(blank_b, emit_b, o, t_lens, u_lens, time_block)
    # Degenerate rows — the band pruned ALL paths (u_len > band inside the
    # first/last block, or a block-to-block offset jump > Wp) — surface as
    # a ~1e30 NLL.  Mask them out of the mean instead of letting one
    # pathological utterance dominate the batch loss; they behave like the
    # loop's bad-segment filtering (skipped, carry frozen by row_valid
    # upstream when the caller chooses).
    ok = per < 1e29
    per = jnp.where(ok, per, 0.0)        # where, not *: NaN·0 = NaN
    finite = ok.astype(per.dtype)
    valid = finite if row_valid is None else row_valid.astype(per.dtype) * finite
    loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return (loss, per) if return_per else loss
