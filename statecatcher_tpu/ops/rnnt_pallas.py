"""Fused RNN-T joint → (blank, emit) Pallas kernel.

The transducer loss only ever consumes two slices of the joint distribution:
``blank_lp(t,u)`` and ``emit_lp(t,u) = logP(label_u | t,u)``.  The XLA remat
path (ops/rnnt.py:rnnt_loss_fused) still materializes the (B, C, U+1, V)
logits chunk in HBM three times per step (matmul out, logsumexp read, gather
read) — measured at ~490 ms of the ~580 ms RNN-T segment step at flagship
shapes (tools/profile_rnnt.py).  This kernel is the TPU-native replacement
for warp_rnnt's ``gather=True`` fused gather (reference model.py:97-105,
train.py:38-42): the full-vocab logits tile lives only in VMEM.

Forward, per (b, time-block) grid step:
  joint = tanh(enc_tile[:, None, :] + pred[None, :, :])      (Tb, U1p, Jp)
  logits = joint · K                                          MXU, f32 accum
  blank = logits[..., blank_id] − logsumexp(logits)
  emit  = Σ_v onehot(labels) · logits − logsumexp(logits)

The join bias rides in the padded contraction lanes: lane J of the joint is
forced to 1.0 and row J of the kernel matrix holds the bias, so the bias
gradient falls out of the same backward matmul as d_K and the tanh' factor
(1 − joint²) is exactly zero on that lane.

Backward (custom_vjp) recomputes the tile (remat — nothing joint-sized is
saved), forms the fused softmax adjoint

  d_logits = g_b·δ_blank + g_e·onehot − (g_b + g_e)·softmax(logits)

and contracts it on the MXU three ways: d_enc per tile, d_pred accumulated
over time blocks (VMEM-resident output block per b), d_K accumulated over the
whole grid (constant-index output block; TPU grids run sequentially on a
core, so read-modify-write revisiting is well-defined).

``rnnt_loss_pallas`` composes this with the Pallas lattice DP
(ops/rnnt_dp_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _joint_tile(enc, pred, k_ref, bias_lane: int, mm_dtype):
    """tanh joint for one tile + vocab matmul.

    enc: (Tb, Jp) f32, pred: (U1p, Jp) f32.  Returns joint3 (Tb, U1p, Jp)
    f32 with the bias lane forced to 1, and logits2 (Tb·U1p, Vp) f32.
    """
    Tb, U1p = enc.shape[0], pred.shape[0]
    joint = jnp.tanh(enc[:, None, :] + pred[None, :, :])
    lane = jax.lax.broadcasted_iota(jnp.int32, joint.shape, 2)
    joint = jnp.where(lane == bias_lane, 1.0, joint)
    j2 = joint.reshape(Tb * U1p, joint.shape[2])
    logits = jax.lax.dot_general(
        j2.astype(mm_dtype), k_ref[:].astype(mm_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return joint, logits


def _fwd_kernel(Tb: int, U1p: int, blank_id: int, bias_lane: int, mm_dtype):
    def kernel(enc_ref, pred_ref, k_ref, ke_ref, blank_ref, emit_ref):
        enc = enc_ref[0].astype(jnp.float32)
        pred = pred_ref[0].astype(jnp.float32)
        joint, logits = _joint_tile(enc, pred, k_ref, bias_lane, mm_dtype)
        m = jnp.max(logits, axis=1, keepdims=True)
        log_z = (
            m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
        ).reshape(Tb, U1p)
        blank_logit = logits.reshape(Tb, U1p, -1)[:, :, blank_id]
        # emit logit via the gathered kernel column ke[u] = K[:, label_u]:
        # a J-length reduce instead of a full-vocab one-hot reduce.
        ke = ke_ref[0].astype(jnp.float32)             # (U1p, Jp)
        emit_logit = jnp.sum(joint * ke[None, :, :], axis=2)
        blank_ref[0] = blank_logit - log_z
        emit_ref[0] = emit_logit - log_z

    return kernel


def _bwd_kernel(Tb: int, U1p: int, blank_id: int, bias_lane: int, mm_dtype):
    def kernel(enc_ref, pred_ref, k_ref, oh_ref, gb_ref, ge_ref,
               denc_ref, dpred_ref, dk_ref):
        ib = pl.program_id(0)
        it = pl.program_id(1)
        enc = enc_ref[0].astype(jnp.float32)
        pred = pred_ref[0].astype(jnp.float32)
        joint, logits = _joint_tile(enc, pred, k_ref, bias_lane, mm_dtype)
        V = logits.shape[1]
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(Tb, U1p, V)

        g_b = gb_ref[0].astype(jnp.float32)        # (Tb, U1p)
        g_e = ge_ref[0].astype(jnp.float32)        # (Tb, U1p)
        oh = oh_ref[0].astype(jnp.float32)         # (U1p, V)
        v_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, V), 2)
        blank_oh = (v_ids == blank_id).astype(jnp.float32)
        dlog = (
            g_b[:, :, None] * blank_oh
            + g_e[:, :, None] * oh[None, :, :]
            - (g_b + g_e)[:, :, None] * p
        ).reshape(Tb * U1p, V)

        # d_joint = (dlog · Kᵀ) ⊙ (1 − joint²); bias lane zeroed by tanh'.
        dj = jax.lax.dot_general(
            dlog.astype(mm_dtype), k_ref[:].astype(mm_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(Tb, U1p, -1) * (1.0 - jnp.square(joint))

        denc_ref[0] = jnp.sum(dj, axis=1)

        @pl.when(it == 0)
        def _():
            dpred_ref[0] = jnp.zeros_like(dpred_ref[0])

        dpred_ref[0] += jnp.sum(dj, axis=0)

        @pl.when(jnp.logical_and(ib == 0, it == 0))
        def _():
            dk_ref[:] = jnp.zeros_like(dk_ref[:])

        j2 = joint.reshape(Tb * U1p, joint.shape[2])
        dk_ref[:] += jax.lax.dot_general(
            j2.astype(mm_dtype), dlog.astype(mm_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    return kernel


# Static config for the core op: (blank_id, bias_lane, time_block, mm_dtype
# name) — hashable, threaded through custom_vjp as a nondiff argument.
# ``ke`` (gathered kernel columns, forward only) and ``oh`` (one-hot emit
# selectors, backward only) are derived views of (kp, labels); their
# cotangents are zero — the full kp gradient comes out of the backward
# kernel's dk (the g_e·onehot matmul term IS the gather adjoint).
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _joint_blank_emit_core(encp, predp, kp, ke, oh, cfg):
    return _core_fwd_impl(encp, predp, kp, ke, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _core_fwd_impl(encp, predp, kp, ke, cfg):
    blank_id, bias_lane, time_block, mm_dtype_name = cfg
    mm_dtype = jnp.dtype(mm_dtype_name)
    B, Tp, Jp = encp.shape
    U1p = predp.shape[1]
    Vp = kp.shape[1]
    Tb = time_block
    return pl.pallas_call(
        _fwd_kernel(Tb, U1p, blank_id, bias_lane, mm_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, U1p), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, U1p), jnp.float32),
        ),
        grid=(B, Tp // Tb),
        in_specs=[
            pl.BlockSpec((1, Tb, Jp), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Jp), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, Vp), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Jp), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Tb, U1p), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, U1p), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(encp, predp, kp, ke)


def _core_fwd(encp, predp, kp, ke, oh, cfg):
    out = _core_fwd_impl(encp, predp, kp, ke, cfg)
    return out, (encp, predp, kp, oh)


def _core_bwd(cfg, res, g):
    blank_id, bias_lane, time_block, mm_dtype_name = cfg
    mm_dtype = jnp.dtype(mm_dtype_name)
    encp, predp, kp, oh = res
    g_blank, g_emit = g
    B, Tp, Jp = encp.shape
    U1p = predp.shape[1]
    Vp = kp.shape[1]
    Tb = time_block
    denc, dpred, dk = pl.pallas_call(
        _bwd_kernel(Tb, U1p, blank_id, bias_lane, mm_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, Jp), jnp.float32),
            jax.ShapeDtypeStruct((B, U1p, Jp), jnp.float32),
            jax.ShapeDtypeStruct((Jp, Vp), jnp.float32),
        ),
        grid=(B, Tp // Tb),
        in_specs=[
            pl.BlockSpec((1, Tb, Jp), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Jp), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, Vp), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Vp), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, U1p), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, U1p), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Tb, Jp), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, Jp), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, Vp), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(encp, predp, kp, oh, g_blank, g_emit)
    return (
        denc.astype(encp.dtype),
        dpred.astype(predp.dtype),
        dk.astype(kp.dtype),
        jnp.zeros((B, U1p, Jp), encp.dtype),   # ke: derived view, no cotangent
        jnp.zeros_like(oh),
    )


_joint_blank_emit_core.defvjp(_core_fwd, _core_bwd)


def joint_blank_emit(
    enc_p: jnp.ndarray,        # (B, T, J)
    pred_p: jnp.ndarray,       # (B, U+1, J)
    join_kernel: jnp.ndarray,  # (J, V)
    join_bias: jnp.ndarray,    # (V,)
    labels: jnp.ndarray,       # (B, U) int32
    blank_id: int = 0,
    time_block: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused joint: returns (blank_lp (B,T,U+1), emit_lp (B,T,U)), float32.

    Differentiable w.r.t. enc_p, pred_p, join_kernel, join_bias.  The vocab
    matmul runs in enc_p's dtype (bf16 under mixed precision — parity with
    the XLA path's ``join_kernel.astype(joint.dtype)``), accumulating f32.
    """
    B, T, J = enc_p.shape
    U1 = pred_p.shape[1]
    U = U1 - 1
    V = join_kernel.shape[1]
    Jp = _round_up(J + 1, _LANE)
    U1p = _round_up(U1, 8)
    Tp = _round_up(T, time_block)
    Vp = _round_up(V, _LANE)

    encp = jnp.pad(enc_p, ((0, 0), (0, Tp - T), (0, Jp - J)))
    predp = jnp.pad(pred_p, ((0, 0), (0, U1p - U1), (0, Jp - J)))
    # Bias folded into contraction row J; padded vocab columns get a −1e30
    # bias so they can never win the softmax.  Built inside the traced graph
    # so gradients flow back through the pad/set ops to kernel and bias.
    kp = jnp.zeros((Jp, Vp), join_kernel.dtype)
    kp = kp.at[:J, :V].set(join_kernel)
    kp = kp.at[J, :V].set(join_bias.astype(join_kernel.dtype))
    if Vp > V:
        kp = kp.at[J, V:].set(-1e30)
    # One-hot emit selectors (backward dk term); all-zero rows for u ≥ U
    # (their emit output is unused downstream, their incoming gradient zero).
    oh = jax.nn.one_hot(labels, Vp, dtype=jnp.bfloat16)         # (B, U, Vp)
    oh = jnp.pad(oh, ((0, 0), (0, U1p - U), (0, 0)))
    # Gathered kernel columns for the forward emit logit: ke[b,u,:] =
    # kp[:, label_u] (includes the bias in lane J).  stop_gradient: the kp
    # gradient of this path is produced by the backward kernel's dk.
    ke = jnp.swapaxes(
        jnp.take(jax.lax.stop_gradient(kp), labels, axis=1), 0, 1
    ).swapaxes(1, 2)                                            # (B, U, Jp)
    ke = jnp.pad(ke, ((0, 0), (0, U1p - U), (0, 0)))

    mm_dtype = jnp.bfloat16 if enc_p.dtype == jnp.bfloat16 else jnp.float32
    cfg = (blank_id, J, time_block, jnp.dtype(mm_dtype).name)
    blank, emit = _joint_blank_emit_core(encp, predp, kp, ke, oh, cfg)
    return blank[:, :T, :U1], emit[:, :T, :U]


def rnnt_loss_pallas(
    enc_proj: jnp.ndarray,
    pred_proj: jnp.ndarray,
    join_kernel: jnp.ndarray,
    join_bias: jnp.ndarray,
    labels: jnp.ndarray,
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    blank_id: int = 0,
    row_valid=None,
    time_block: int = 8,
    return_per: bool = False,
) -> jnp.ndarray:
    """Transducer loss with the fused Pallas joint + XLA lattice DP.

    Same semantics/normalization as ops/rnnt.py:rnnt_loss_fused (mean over
    valid rows of per-utterance NLL, warp_rnnt reduction="mean" parity).
    """
    from statecatcher_tpu.ops.rnnt_dp_pallas import rnnt_nll_dp_pallas

    blank_lp, emit_lp = joint_blank_emit(
        enc_proj, pred_proj, join_kernel, join_bias, labels,
        blank_id=blank_id, time_block=time_block,
    )
    per = rnnt_nll_dp_pallas(blank_lp, emit_lp, t_lens, u_lens)
    if row_valid is None:
        loss = jnp.mean(per)
    else:
        valid = row_valid.astype(per.dtype)
        loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return (loss, per) if return_per else loss
