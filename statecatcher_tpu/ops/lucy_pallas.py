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


def _scan_kernel(C: int, BD: int, T: int):
    """Kernel body for one (b, d-block, t-chunk) step.

    ``T`` is the true (unpadded) time length: rows of the ragged tail chunk
    beyond it are forced to the identity map (a=1, b=0) in-register, so the
    caller never materializes a padded copy of the inputs (Mosaic pads edge
    blocks; the garbage is masked before use, and OOB writes are dropped)."""

    def kernel(s0_ref, a_ref, b_ref, out_ref, carry_ref):
        it = pl.program_id(2)

        @pl.when(it == 0)
        def _():
            carry_ref[:] = s0_ref[0].astype(jnp.float32)

        A = a_ref[0].astype(jnp.float32)          # (C, BD)
        Bv = b_ref[0].astype(jnp.float32)         # (C, BD)
        if T % C:
            grow = it * C + jax.lax.broadcasted_iota(jnp.int32, (C, BD), 0)
            A = jnp.where(grow < T, A, 1.0)
            Bv = jnp.where(grow < T, Bv, 0.0)

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
    pad_d = (-D) % _LANE
    if pad_d:
        # Lane padding is rare (D is a multiple of 128 in every shipped
        # config); the ragged TIME tail is handled in-kernel with no copy.
        a = jnp.pad(a, ((0, 0), (0, 0), (0, pad_d)), constant_values=1.0)
        b = jnp.pad(b, ((0, 0), (0, 0), (0, pad_d)))
        s0 = jnp.pad(s0, ((0, 0), (0, pad_d)))
    Dp = D + pad_d
    BD = _LANE
    grid = (B, Dp // BD, -(-T // C))

    # s0 as (B, 8, D): sublane-aligned block for the carry initialization.
    s0_tiled = jnp.broadcast_to(s0[:, None, :], (B, 8, Dp))

    out = pl.pallas_call(
        _scan_kernel(C, BD, T),
        out_shape=jax.ShapeDtypeStruct((B, T, Dp), a.dtype),
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
    return out[:, :, :D] if pad_d else out


def _rev_scan_kernel(C: int, BD: int, T: int, nchunks: int):
    """Adjoint scan  λ_t = g_t + a_{t+1}·λ_{t+1}  — time chunks visited in
    REVERSE grid order (index maps below), suffix composition within the
    chunk, so no jnp.flip HBM passes are needed (measured ~2 ms/layer/segment
    at flagship shapes).  The one-step shift of ``a`` is an in-register roll;
    the chunk-boundary element comes from the previously processed (later in
    time) chunk via scratch.

    Ragged tail rows (global index ≥ T — only in the chunk processed at
    it=0) are masked to identity maps (a=1, g=0) before the shift, so λ
    stays 0 through them and no padded input copy is needed."""

    def kernel(a_ref, g_ref, out_ref, carry_ref, anext_ref):
        it = pl.program_id(2)

        @pl.when(it == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)
            anext_ref[:] = jnp.ones_like(anext_ref)

        a = a_ref[0].astype(jnp.float32)           # (C, BD)
        g = g_ref[0].astype(jnp.float32)
        if T % C:
            grow = (nchunks - 1 - it) * C + jax.lax.broadcasted_iota(
                jnp.int32, (C, BD), 0)
            a = jnp.where(grow < T, a, 1.0)
            g = jnp.where(grow < T, g, 0.0)

        # A'[t] = a[t+1] within the chunk; row C−1 takes the first row of
        # the later chunk (saved in scratch).
        a_up = pltpu.roll(a, C - 1, 0)             # row t ← a[t+1] (circular)
        row = jax.lax.broadcasted_iota(jnp.int32, (C, BD), 0)
        A = jnp.where(row == C - 1, anext_ref[0:1, :], a_up)
        anext_ref[:] = jnp.broadcast_to(a[0:1, :], anext_ref.shape)

        # Suffix Hillis-Steele: S_t = M_t ∘ M_{t+1} ∘ … (info flows DOWN).
        Bv = g
        k = 1
        while k < C:
            a_sh = pltpu.roll(A, C - k, 0)          # shift by −k
            b_sh = pltpu.roll(Bv, C - k, 0)
            valid = row < C - k
            a_sh = jnp.where(valid, a_sh, 1.0)
            b_sh = jnp.where(valid, b_sh, 0.0)
            Bv = A * b_sh + Bv
            A = A * a_sh
            k *= 2

        lam = Bv + A * carry_ref[0:1, :]
        out_ref[0] = lam.astype(out_ref.dtype)
        carry_ref[:] = jnp.broadcast_to(lam[0:1, :], carry_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def _linear_scan_pallas_rev_impl(a, g, chunk: int = 256):
    """All adjoints  λ_t = g_t + a_{t+1}·λ_{t+1}  (λ beyond T−1 = 0)."""
    B, T, D = a.shape
    C = min(chunk, max(8, T))
    pad_d = (-D) % _LANE
    if pad_d:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, pad_d)), constant_values=1.0)
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_d)))
    Dp = D + pad_d
    BD = _LANE
    nchunks = -(-T // C)
    grid = (B, Dp // BD, nchunks)

    rev_spec = pl.BlockSpec(
        (1, C, BD), lambda ib, id_, it, n=nchunks: (ib, n - 1 - it, id_),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _rev_scan_kernel(C, BD, T, nchunks),
        out_shape=jax.ShapeDtypeStruct((B, T, Dp), a.dtype),
        grid=grid,
        in_specs=[rev_spec, rev_spec],
        out_specs=rev_spec,
        scratch_shapes=[
            pltpu.VMEM((8, BD), jnp.float32),
            pltpu.VMEM((8, BD), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(a, g)
    return out[:, :, :D] if pad_d else out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def linear_scan_pallas(a, b, s0):
    """s_t = a_t · s_{t-1} + b_t over axis 1, fused TPU kernel, full VJP."""
    return _linear_scan_pallas_fwd_impl(a, b, s0)


def _fwd(a, b, s0):
    s = _linear_scan_pallas_fwd_impl(a, b, s0)
    return s, (a, s, s0)


def _bwd(res, g):
    a, s, s0 = res
    lam = _linear_scan_pallas_rev_impl(a, g)
    # s_{t-1} with s_0 = s0 prepended
    s_prev = jnp.concatenate([s0[:, None, :], s[:, :-1]], axis=1)
    da = lam * s_prev
    db = lam
    ds0 = lam[:, 0] * a[:, 0]
    return da.astype(a.dtype), db.astype(a.dtype), ds0.astype(s0.dtype)


linear_scan_pallas.defvjp(_fwd, _bwd)


# =========================================================================== #
# Fully-fused LucyRNN cell: gate normalization + both recurrences in ONE
# kernel pass over the gates.
#
# Per (b, d-block, t-chunk): load the (C, 7, BD) gate tile once, do the
# grouped-RMS/sigmoid gate math in registers, run the s-scan and the h-scan
# as Hillis-Steele compositions, write h and s tiles.  HBM traffic per layer
# drops from ~16 plane-passes (separate gate math + 2 scan kernels + tanh)
# to 7 reads + 2 writes.
#
# Backward (custom_vjp): the elementwise gate chain is re-derived by jax.vjp
# of the same math in XLA (recompute-from-gates), and the two adjoint
# recurrences λ_t = g_t + a_{t+1}·λ_{t+1} run through the Pallas reverse
# scan — so the kernel needs no hand-written derivative of the RMS coupling.
# =========================================================================== #
_EPS = 1e-6


def lucy_gate_coeffs(gates, frame_mask=None, bias=None):
    """Raw gates → scan coefficients (a_s, b_s, a_h, bh_c, h_pre_n).

    ``gates`` is either (B, T, 7, D) or the lane-major (B, T, 7·D) layout —
    the latter avoids the (B,T,7D)→(B,T,7,D) retiling pass on TPU (the 7 on
    the sublane axis pads to 8 and forces real data movement; lane-dim
    slices at D-multiples are free).  ``bias`` is an optional (7·D,) gate
    bias added here instead of in the projection so the add fuses into this
    elementwise pass rather than materializing a (B,T,7D) round-trip.
    ``bh_c`` is (1 − z_n) (the h-scan's b is (1 − z_n)·c with c computed
    from the s-scan output).
    """
    if gates.ndim == 4:
        D = gates.shape[-1]
        def _gate(i):
            x = gates[:, :, i, :]
            if bias is not None:
                x = x + jax.lax.slice_in_dim(bias, i * D, (i + 1) * D, axis=0
                                             ).astype(x.dtype)
            return x
    else:
        D = gates.shape[-1] // 7
        def _gate(i):
            x = jax.lax.slice_in_dim(gates, i * D, (i + 1) * D, axis=2)
            if bias is not None:
                x = x + jax.lax.slice_in_dim(bias, i * D, (i + 1) * D, axis=0
                                             ).astype(x.dtype)
            return x
    r, z, k, v, h_pre, decay, alpha = (_gate(i) for i in range(7))
    rms_rz = jnp.sqrt((jnp.square(r) + jnp.square(z)) / 2 + _EPS)
    rms_kv2 = (jnp.square(k) + jnp.square(v)) / 2 + _EPS
    rms_kv = jnp.sqrt(rms_kv2)
    rms_d = jnp.sqrt(jnp.square(decay) + _EPS)
    rms_a = jnp.sqrt(jnp.square(alpha) + _EPS)
    rms_h = jnp.sqrt(jnp.square(h_pre) + _EPS)
    z_n = jax.nn.sigmoid(z / rms_rz)
    decay_n = jax.nn.sigmoid(decay / rms_d)
    alpha_n = jax.nn.sigmoid(alpha / rms_a)
    h_pre_n = h_pre / rms_h
    kv = (k / rms_kv) * (v / rms_kv) / (rms_kv2 + _EPS)
    a_s = decay_n
    b_s = alpha_n * kv
    a_h = z_n
    bh_c = 1.0 - z_n
    if frame_mask is not None:
        m = frame_mask[..., None].astype(a_s.dtype)
        a_s = m * a_s + (1.0 - m)
        b_s = m * b_s
        a_h = m * a_h + (1.0 - m)
        bh_c = m * bh_c
    return a_s, b_s, a_h, bh_c, h_pre_n


def _hillis_steele(A, Bv, C):
    k = 1
    while k < C:
        a_sh = pltpu.roll(A, k, 0)
        b_sh = pltpu.roll(Bv, k, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0)
        valid = row >= k
        a_sh = jnp.where(valid, a_sh, 1.0)
        b_sh = jnp.where(valid, b_sh, 0.0)
        Bv = A * b_sh + Bv
        A = A * a_sh
        k *= 2
    return A, Bv


def _fused_cell_kernel(C, BD, masked: bool, T: int):
    def kernel(*refs):
        if masked:
            (h0_ref, s0_ref, gates_ref, mask_ref,
             h_out_ref, s_out_ref, hc_ref, sc_ref) = refs
        else:
            (h0_ref, s0_ref, gates_ref,
             h_out_ref, s_out_ref, hc_ref, sc_ref) = refs
        it = pl.program_id(2)

        @pl.when(it == 0)
        def _():
            hc_ref[:] = h0_ref[0].astype(jnp.float32)
            sc_ref[:] = s0_ref[0].astype(jnp.float32)

        g = gates_ref[0]                               # (7, C, BD)
        r = g[0].astype(jnp.float32)
        z = g[1].astype(jnp.float32)
        k = g[2].astype(jnp.float32)
        v = g[3].astype(jnp.float32)
        h_pre = g[4].astype(jnp.float32)
        decay = g[5].astype(jnp.float32)
        alpha = g[6].astype(jnp.float32)
        rms_rz = jnp.sqrt((r * r + z * z) / 2 + _EPS)
        rms_kv2 = (k * k + v * v) / 2 + _EPS
        rms_kv = jnp.sqrt(rms_kv2)
        z_n = jax.nn.sigmoid(z / rms_rz)
        decay_n = jax.nn.sigmoid(decay / jnp.sqrt(decay * decay + _EPS))
        alpha_n = jax.nn.sigmoid(alpha / jnp.sqrt(alpha * alpha + _EPS))
        h_pre_n = h_pre / jnp.sqrt(h_pre * h_pre + _EPS)
        kv = (k / rms_kv) * (v / rms_kv) / (rms_kv2 + _EPS)

        a_s = decay_n
        b_s = alpha_n * kv
        a_h = z_n
        bh_c = 1.0 - z_n
        if masked:
            m = mask_ref[0].astype(jnp.float32)        # (C, BD)
            a_s = m * a_s + (1.0 - m)
            b_s = m * b_s
            a_h = m * a_h + (1.0 - m)
            bh_c = m * bh_c

        if T % C:
            # Ragged tail: rows ≥ T hold Mosaic edge-pad garbage — force
            # them to identity maps before the scans.
            valid = (it * C + jax.lax.broadcasted_iota(
                jnp.int32, (C, BD), 0)) < T
            a_s = jnp.where(valid, a_s, 1.0)
            b_s = jnp.where(valid, b_s, 0.0)
            a_h = jnp.where(valid, a_h, 1.0)

        As, Bs = _hillis_steele(a_s, b_s, C)
        s = Bs + As * sc_ref[0:1, :]
        c = jnp.tanh(h_pre_n + s)
        b_h = bh_c * c
        if T % C:
            # mask the PRODUCT: c is NaN-prone on garbage rows (0·NaN = NaN)
            b_h = jnp.where(valid, b_h, 0.0)
        Ah, Bh = _hillis_steele(a_h, b_h, C)
        h = Bh + Ah * hc_ref[0:1, :]

        h_out_ref[0] = h.astype(h_out_ref.dtype)
        s_out_ref[0] = s.astype(s_out_ref.dtype)
        hc_ref[:] = jnp.broadcast_to(h[C - 1:C, :], hc_ref.shape)
        sc_ref[:] = jnp.broadcast_to(s[C - 1:C, :], sc_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def _fused_cell_fwd_impl(gates, h0, s0, frame_mask, chunk: int = 256):
    B, T, G, D = gates.shape
    assert G == 7
    C = min(chunk, max(8, T))
    pad_d = (-D) % _LANE
    masked = frame_mask is not None
    if pad_d:
        gates = jnp.pad(gates, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        h0 = jnp.pad(h0, ((0, 0), (0, pad_d)))
        s0 = jnp.pad(s0, ((0, 0), (0, pad_d)))
    Dp = D + pad_d
    BD = _LANE
    grid = (B, Dp // BD, -(-T // C))
    h0_t = jnp.broadcast_to(h0[:, None, :], (B, 8, Dp))
    s0_t = jnp.broadcast_to(s0[:, None, :], (B, 8, Dp))
    # (B, 7, T, D): each gate's time-chunk is a contiguous aligned (C, BD)
    # tile inside the kernel (a (C, 7, BD) layout would stride gate slices
    # across sublanes and force relayouts)
    gates_b7td = jnp.transpose(gates, (0, 2, 1, 3))

    in_specs = [
        pl.BlockSpec((1, 8, BD), lambda ib, id_, it: (ib, 0, id_),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, BD), lambda ib, id_, it: (ib, 0, id_),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 7, C, BD), lambda ib, id_, it: (ib, 0, it, id_),
                     memory_space=pltpu.VMEM),
    ]
    args = [h0_t, s0_t, gates_b7td]
    if masked:
        mask_f = jnp.broadcast_to(
            frame_mask[:, :, None].astype(gates.dtype), (B, T, Dp)
        )
        in_specs.append(
            pl.BlockSpec((1, C, BD), lambda ib, id_, it: (ib, it, id_),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask_f)

    h_all, s_all = pl.pallas_call(
        _fused_cell_kernel(C, BD, masked, T),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, Dp), gates.dtype),
            jax.ShapeDtypeStruct((B, T, Dp), gates.dtype),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, C, BD), lambda ib, id_, it: (ib, it, id_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, BD), lambda ib, id_, it: (ib, it, id_),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, BD), jnp.float32),
            pltpu.VMEM((8, BD), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*args)
    if pad_d:
        return h_all[:, :, :D], s_all[:, :, :D]
    return h_all, s_all


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lucy_fused_cell(gates, h0, s0, frame_mask):
    """Fused 7-gate cell: (gates (B,T,7,D), h0, s0[, mask]) → (h_all, s_all)."""
    return _fused_cell_fwd_impl(gates, h0, s0, frame_mask)


def _fused_fwd(gates, h0, s0, frame_mask):
    h_all, s_all = _fused_cell_fwd_impl(gates, h0, s0, frame_mask)
    return (h_all, s_all), (gates, h0, s0, frame_mask, h_all, s_all)


def _fused_bwd(res, cotangents):
    gates, h0, s0, frame_mask, h_all, s_all = res
    g_h, g_s = cotangents
    g_h = g_h.astype(jnp.float32)
    g_s = g_s.astype(jnp.float32)

    # Recompute the elementwise chain (and capture its VJP) in XLA.
    (a_s, b_s, a_h, bh_c, h_pre_n), elem_vjp = jax.vjp(
        lambda g: lucy_gate_coeffs(g, frame_mask), gates.astype(jnp.float32)
    )
    s_prev = jnp.concatenate(
        [s0.astype(jnp.float32)[:, None, :], s_all.astype(jnp.float32)[:, :-1]],
        axis=1,
    )
    h_prev = jnp.concatenate(
        [h0.astype(jnp.float32)[:, None, :], h_all.astype(jnp.float32)[:, :-1]],
        axis=1,
    )
    c = jnp.tanh(h_pre_n + s_all.astype(jnp.float32))

    # h-recurrence adjoint: h_t = a_h·h_{t-1} + bh_c·c_t
    lam_h = _linear_scan_pallas_rev_impl(a_h, g_h)
    d_a_h = lam_h * h_prev
    d_bhc = lam_h * c
    d_c = lam_h * bh_c
    dh0 = lam_h[:, 0] * a_h[:, 0]

    # c = tanh(h_pre_n + s): both inputs get d_c·(1−c²)
    d_pre_s = d_c * (1.0 - jnp.square(c))
    d_h_pre_n = d_pre_s

    # s-recurrence adjoint (external g_s + internal path through c)
    lam_s = _linear_scan_pallas_rev_impl(a_s, g_s + d_pre_s)
    d_a_s = lam_s * s_prev
    d_b_s = lam_s
    ds0 = lam_s[:, 0] * a_s[:, 0]

    (d_gates,) = elem_vjp((d_a_s, d_b_s, d_a_h, d_bhc, d_h_pre_n))
    return d_gates.astype(gates.dtype), dh0.astype(h0.dtype), ds0.astype(s0.dtype), None


lucy_fused_cell.defvjp(_fused_fwd, _fused_bwd)


# =========================================================================== #
# Dual-scan kernel: the s-scan → tanh → h-scan chain in ONE kernel, but with
# the gate normalization left to XLA (where it fuses into the gate matmul's
# epilogue).  Inputs are four (B, T, D) planes in their natural layout —
# a_s, b_s, a_h, h_pre_n — so unlike ``lucy_fused_cell`` there is no
# (B,T,7,D) → (B,7,T,D) relayout pass of the full gate tensor (measured to
# cost more than the fusion saved).  The h-scan's offset uses the identity
# b_h = (1 − a_h)·c, which also holds on masked steps (mask forces a_h = 1,
# b_h = 0), so the mask never enters the kernel.
#
# vs the separate-scans path this removes the HBM round-trips of c/b_h and
# the intermediate s_all read (s_all is still written once for the backward
# and the final carry).
# =========================================================================== #


def _dual_scan_kernel(C: int, BD: int, T: int):
    def kernel(h0_ref, s0_ref, as_ref, bs_ref, ah_ref, hp_ref,
               h_out_ref, s_out_ref, hc_ref, sc_ref):
        it = pl.program_id(2)

        @pl.when(it == 0)
        def _():
            hc_ref[:] = h0_ref[0].astype(jnp.float32)
            sc_ref[:] = s0_ref[0].astype(jnp.float32)

        a_s = as_ref[0].astype(jnp.float32)       # (C, BD)
        b_s = bs_ref[0].astype(jnp.float32)
        a_h = ah_ref[0].astype(jnp.float32)
        h_pre = hp_ref[0].astype(jnp.float32)
        if T % C:
            # Ragged tail rows: identity maps (no padded input copy).
            valid = (it * C + jax.lax.broadcasted_iota(
                jnp.int32, (C, BD), 0)) < T
            a_s = jnp.where(valid, a_s, 1.0)
            b_s = jnp.where(valid, b_s, 0.0)
            a_h = jnp.where(valid, a_h, 1.0)

        As, Bs = _hillis_steele(a_s, b_s, C)
        s = Bs + As * sc_ref[0:1, :]
        c = jnp.tanh(h_pre + s)
        b_h = (1.0 - a_h) * c
        if T % C:
            # mask the PRODUCT: c is NaN-prone on garbage rows (0·NaN = NaN)
            b_h = jnp.where(valid, b_h, 0.0)
        Ah, Bh = _hillis_steele(a_h, b_h, C)
        h = Bh + Ah * hc_ref[0:1, :]

        h_out_ref[0] = h.astype(h_out_ref.dtype)
        s_out_ref[0] = s.astype(s_out_ref.dtype)
        hc_ref[:] = jnp.broadcast_to(h[C - 1:C, :], hc_ref.shape)
        sc_ref[:] = jnp.broadcast_to(s[C - 1:C, :], sc_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def _dual_scan_fwd_impl(a_s, b_s, a_h, h_pre, h0, s0, chunk: int = 256):
    B, T, D = a_s.shape
    C = min(chunk, max(8, T))
    pad_d = (-D) % _LANE
    if pad_d:
        pad3 = ((0, 0), (0, 0), (0, pad_d))
        a_s = jnp.pad(a_s, pad3, constant_values=1.0)
        b_s = jnp.pad(b_s, pad3)
        a_h = jnp.pad(a_h, pad3, constant_values=1.0)
        h_pre = jnp.pad(h_pre, pad3)
        h0 = jnp.pad(h0, ((0, 0), (0, pad_d)))
        s0 = jnp.pad(s0, ((0, 0), (0, pad_d)))
    Dp = D + pad_d
    BD = _LANE
    grid = (B, Dp // BD, -(-T // C))
    h0_t = jnp.broadcast_to(h0[:, None, :], (B, 8, Dp))
    s0_t = jnp.broadcast_to(s0[:, None, :], (B, 8, Dp))

    plane = pl.BlockSpec((1, C, BD), lambda ib, id_, it: (ib, it, id_),
                         memory_space=pltpu.VMEM)
    init = pl.BlockSpec((1, 8, BD), lambda ib, id_, it: (ib, 0, id_),
                        memory_space=pltpu.VMEM)
    h_all, s_all = pl.pallas_call(
        _dual_scan_kernel(C, BD, T),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, Dp), a_s.dtype),
            jax.ShapeDtypeStruct((B, T, Dp), a_s.dtype),
        ),
        grid=grid,
        in_specs=[init, init, plane, plane, plane, plane],
        out_specs=(plane, plane),
        scratch_shapes=[
            pltpu.VMEM((8, BD), jnp.float32),
            pltpu.VMEM((8, BD), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(h0_t, s0_t, a_s, b_s, a_h, h_pre)
    if pad_d:
        return h_all[:, :, :D], s_all[:, :, :D]
    return h_all, s_all


@jax.custom_vjp
def lucy_dual_scan(a_s, b_s, a_h, h_pre, h0, s0):
    """Fused s-scan → tanh → h-scan:  returns (h_all, s_all), (B, T, D)."""
    return _dual_scan_fwd_impl(a_s, b_s, a_h, h_pre, h0, s0)


def _dual_fwd(a_s, b_s, a_h, h_pre, h0, s0):
    h_all, s_all = _dual_scan_fwd_impl(a_s, b_s, a_h, h_pre, h0, s0)
    return (h_all, s_all), (a_s, a_h, h_pre, h0, s0, h_all, s_all)


def _dual_bwd(res, cotangents):
    a_s, a_h, h_pre, h0, s0, h_all, s_all = res
    g_h, g_s = cotangents
    g_h = g_h.astype(jnp.float32)
    g_s = g_s.astype(jnp.float32)
    a_s32 = a_s.astype(jnp.float32)
    a_h32 = a_h.astype(jnp.float32)
    s32 = s_all.astype(jnp.float32)
    s_prev = jnp.concatenate(
        [s0.astype(jnp.float32)[:, None, :], s32[:, :-1]], axis=1
    )
    h_prev = jnp.concatenate(
        [h0.astype(jnp.float32)[:, None, :], h_all.astype(jnp.float32)[:, :-1]],
        axis=1,
    )
    c = jnp.tanh(h_pre.astype(jnp.float32) + s32)

    # h-recurrence adjoint: h_t = a_h·h_{t-1} + (1 − a_h)·c_t
    lam_h = _linear_scan_pallas_rev_impl(a_h32, g_h)
    d_a_h = lam_h * (h_prev - c)
    d_c = lam_h * (1.0 - a_h32)
    dh0 = lam_h[:, 0] * a_h32[:, 0]

    # c = tanh(h_pre + s): both inputs get d_c·(1 − c²)
    d_pre = d_c * (1.0 - jnp.square(c))

    # s-recurrence adjoint (external g_s + internal path through c)
    lam_s = _linear_scan_pallas_rev_impl(a_s32, g_s + d_pre)
    d_a_s = lam_s * s_prev
    ds0 = lam_s[:, 0] * a_s32[:, 0]

    return (
        d_a_s.astype(a_s.dtype),
        lam_s.astype(a_s.dtype),
        d_a_h.astype(a_h.dtype),
        d_pre.astype(h_pre.dtype),
        dh0.astype(h0.dtype),
        ds0.astype(s0.dtype),
    )


lucy_dual_scan.defvjp(_dual_fwd, _dual_bwd)


