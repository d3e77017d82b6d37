"""Pallas TPU CTC loss: on-chip alpha/beta lattice with custom VJP.

Replaces cuDNN CTC (reference train.py:141-142) with a TPU kernel.  Why a
kernel at all: the XLA scan formulation pays per-step dispatch overhead for
T ≈ 1600 sequential steps of tiny (B, 2U+1) work; here the whole T-loop runs
inside one kernel with the alpha row resident in VMEM — per step it is two
lane-rolls, a fused logaddexp3 and an add on an (8, S) tile.

Layout: batch rows on sublanes (B padded to 8), lattice states on lanes
(S = 2U+1 padded to 128-multiples).  Grid iterates time chunks; the alpha
row carries across grid steps in scratch.  All alphas (B, T, S) are written
out — the backward pass runs the mirrored beta kernel and converts
occupancy posteriors to vocab gradients with one one-hot matmul (MXU), the
standard  ∂L/∂logp(t,v) = −Σ_{s: label(s)=v} γ(t,s)  identity.

Numerics: float32 throughout, identical recursion to ops/ctc.py
(ctc_nll_lattice) and torch.nn.CTCLoss (both cross-checked in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from statecatcher_tpu.ops.ctc import _expand_labels, emit_log_probs

_NEG = -1e30
_LANE = 128


def _roll_right(x, k):
    """Shift lattice states s → s+k along lanes, filling with −inf."""
    rolled = pltpu.roll(x, k, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= k, rolled, _NEG)


def _roll_left(x, k):
    S = x.shape[1]
    rolled = pltpu.roll(x, S - k, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < S - k, rolled, _NEG)


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, _NEG)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m <= _NEG / 2, _NEG, out)


def _alpha_kernel(C, BT, SP):
    def kernel(lens_ref, emit_ref, skip_ref, out_ref, alpha_ref):
        tc = pl.program_id(1)
        skip_mask = skip_ref[0]                        # (BP, SP) — 0 or −inf offset
        lens = lens_ref[0]                             # (BP, 1) int32
        lane = jax.lax.broadcasted_iota(jnp.int32, (BT, SP), 1)

        @pl.when(tc == 0)
        def _():
            alpha_ref[:] = jnp.full((BT, SP), _NEG)

        alpha = alpha_ref[:]

        def body(i, alpha):
            t = tc * C + i
            emit_t = emit_ref[i]
            a1 = _roll_right(alpha, 1)
            a2 = _roll_right(alpha, 2) + skip_mask
            rec = _logaddexp3(alpha, a1, a2) + emit_t
            # t == 0: only states 0 (initial blank) and 1 (first label, if it
            # exists — padded states carry −inf emissions) are reachable
            init = jnp.where(lane <= 1, emit_t, _NEG)
            new = jnp.where(t == 0, init, rec)
            active = t < lens                          # (BP, 1) bool
            new = jnp.where(active, new, alpha)
            out_ref[i] = new
            return new

        alpha = jax.lax.fori_loop(0, C, body, alpha)
        alpha_ref[:] = alpha

    return kernel


def _beta_kernel(C, BT, SP):
    """Reverse pass on time-flipped emissions.

    Inputs are pre-flipped so the kernel walks forward over reversed time
    r = 0..T−1 (true t = T−1−r).  Terminal condition handled by masks:
      r < T − L   (t ≥ L):        beta = −inf (dead frames)
      r == T − L  (t == L−1):     beta = terminal (emit at final states)
      r > T − L:                  recursion beta_t = emit_t + lse3(shifts)
    """

    def kernel(tl_ref, emit_ref, skip2_ref, term_ref, out_ref, beta_ref):
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _():
            beta_ref[:] = jnp.full((BT, SP), _NEG)

        start_r = tl_ref[0]                            # (BP, 1): T − L per row
        skip2 = skip2_ref[0]                           # skip allowed INTO s+2
        term = term_ref[0]                             # (BP, SP) terminal mask 0/−inf

        beta = beta_ref[:]

        def body(i, beta):
            r = tc * C + i
            emit_t = emit_ref[i]
            b1 = _roll_left(beta, 1)
            b2 = _roll_left(beta, 2) + skip2
            rec = emit_t + _logaddexp3(beta, b1, b2)
            is_term = r == start_r                     # (BP, 1)
            is_dead = r < start_r
            new = jnp.where(is_term, emit_t + term, rec)
            new = jnp.where(is_dead, jnp.full((BT, SP), _NEG), new)
            out_ref[i] = new
            return new

        beta = jax.lax.fori_loop(0, C, body, beta)
        beta_ref[:] = beta

    return kernel


def _pad_to(x, size, axis, value):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _prep(log_probs, in_lens, labels, blank_id):
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1
    ext = _expand_labels(labels, blank_id)             # (B, S)
    ext_prev2 = jnp.concatenate(
        [jnp.full((B, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1
    )
    allow_skip = (ext != blank_id) & (ext != ext_prev2)
    emit = emit_log_probs(log_probs, ext).astype(jnp.float32)
    return ext, allow_skip, emit, S


def _auto_tiles(T, BP, SP, chunk):
    """(time_chunk, batch_tile) whose 4 live (C, BT, SP) f32 blocks stay
    within ~12 MB of the 16 MB scoped VMEM budget — at S=384, C=128 OOMs
    the grad compile (measured).  Dense-label workloads can exceed the
    budget even at the C=8 floor (S=1025 → SP=1152 at B=96 needs 16.15 MB:
    measured U=512 flagship compile OOM); then the BATCH axis is tiled
    through the grid instead — the α/β scratch row is per batch tile and
    tiles are independent."""
    budget = 12 * 1024 * 1024
    BT = BP
    while True:
        c = budget // (4 * BT * SP * 4)
        if c >= 8 or BT <= 8:
            break
        nxt = BT // 2   # largest multiple-of-8 divisor of BP below BT
        while nxt > 8 and (BP % nxt or nxt % 8):
            nxt -= 1
        BT = nxt if (nxt >= 8 and BP % nxt == 0 and nxt % 8 == 0) else 8
    c = max(8, (min(chunk, c) // 8) * 8)
    return min(c, max(T, 8)), BT


@functools.partial(jax.jit, static_argnames=("chunk",))
def _alpha_all(emit, allow_skip, in_lens, chunk=128):
    """emit (B,T,S) → all alphas (B,T,S) via the Pallas kernel."""
    B, T, S = emit.shape
    BP = -(-B // 8) * 8
    SP = -(-S // _LANE) * _LANE
    C, BT = _auto_tiles(T, BP, SP, chunk)
    TP = -(-T // C) * C

    emit_p = _pad_to(_pad_to(_pad_to(emit, TP, 1, _NEG), SP, 2, _NEG), BP, 0, _NEG)
    # (T, B, S) layout for row-sliced in-kernel access
    emit_tbs = jnp.swapaxes(emit_p, 0, 1)
    skip = jnp.where(
        _pad_to(_pad_to(allow_skip, SP, 1, False), BP, 0, False), 0.0, _NEG
    ).astype(jnp.float32)[None]
    lens = _pad_to(in_lens.astype(jnp.int32), BP, 0, 0)[None, :, None]

    out = pl.pallas_call(
        _alpha_kernel(C, BT, SP),
        out_shape=jax.ShapeDtypeStruct((TP, BP, SP), jnp.float32),
        grid=(BP // BT, TP // C),
        in_specs=[
            pl.BlockSpec((1, BT, 1), lambda g, tc: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BT, SP), lambda g, tc: (tc, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, SP), lambda g, tc: (0, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, BT, SP), lambda g, tc: (tc, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BT, SP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(lens, emit_tbs, skip)
    return jnp.swapaxes(out, 0, 1)[:B, :T, :S]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _beta_all(emit, allow_skip, in_lens, label_lens, chunk=128):
    B, T, S = emit.shape
    BP = -(-B // 8) * 8
    SP = -(-S // _LANE) * _LANE
    C, BT = _auto_tiles(T, BP, SP, chunk)
    TP = -(-T // C) * C

    emit_rev = jnp.flip(emit, axis=1)
    # pad REVERSED time at the END (r ≥ T are beyond the flipped range; the
    # dead-frame mask r < T−L only triggers for r < T so pads recurse
    # harmlessly from −inf states)
    emit_p = _pad_to(_pad_to(_pad_to(emit_rev, TP, 1, _NEG), SP, 2, _NEG), BP, 0, _NEG)
    emit_tbs = jnp.swapaxes(emit_p, 0, 1)

    # skip INTO state s+2 is allowed iff allow_skip[s+2]
    skip_into = jnp.concatenate(
        [allow_skip[:, 2:], jnp.zeros((B, 2), bool)], axis=1
    )
    skip2 = jnp.where(
        _pad_to(_pad_to(skip_into, SP, 1, False), BP, 0, False), 0.0, _NEG
    ).astype(jnp.float32)[None]

    # terminal states: s = 2U−1 (last label, if U>0) and s = 2U (last blank)
    lane = jnp.arange(SP)[None, :]
    ll = _pad_to(label_lens.astype(jnp.int32), BP, 0, 0)[:, None]
    term = jnp.where(
        (lane == 2 * ll) | ((lane == 2 * ll - 1) & (ll > 0)), 0.0, _NEG
    ).astype(jnp.float32)[None]

    start_r = (T - _pad_to(in_lens.astype(jnp.int32), BP, 0, 1))[None, :, None]

    out = pl.pallas_call(
        _beta_kernel(C, BT, SP),
        out_shape=jax.ShapeDtypeStruct((TP, BP, SP), jnp.float32),
        grid=(BP // BT, TP // C),
        in_specs=[
            pl.BlockSpec((1, BT, 1), lambda g, tc: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BT, SP), lambda g, tc: (tc, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, SP), lambda g, tc: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, SP), lambda g, tc: (0, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, BT, SP), lambda g, tc: (tc, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BT, SP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(start_r, emit_tbs, skip2, term)
    beta_rev = jnp.swapaxes(out, 0, 1)[:B, :TP, :S]
    return jnp.flip(beta_rev[:, :T], axis=1)


def _nll_from_alpha(alpha, in_lens, label_lens):
    B, T, S = alpha.shape
    t_idx = jnp.maximum(in_lens - 1, 0)
    alpha_T = jnp.take_along_axis(
        alpha, t_idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]                                          # (B, S)
    has_label = label_lens > 0
    last_label = jnp.maximum(2 * label_lens - 1, 0)
    a_label = jnp.where(
        has_label,
        jnp.take_along_axis(alpha_T, last_label[:, None].astype(jnp.int32), axis=1)[:, 0],
        _NEG,
    )
    a_blank = jnp.take_along_axis(
        alpha_T, (2 * label_lens)[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    return -jnp.logaddexp(a_label, a_blank)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_nll_pallas(log_probs, in_lens, labels, label_lens, blank_id=0):
    """Per-example CTC NLL — Pallas lattice forward."""
    ext, allow_skip, emit, S = _prep(log_probs, in_lens, labels, blank_id)
    alpha = _alpha_all(emit, allow_skip, in_lens)
    return _nll_from_alpha(alpha, in_lens, label_lens)


def _fwd(log_probs, in_lens, labels, label_lens, blank_id):
    ext, allow_skip, emit, S = _prep(log_probs, in_lens, labels, blank_id)
    alpha = _alpha_all(emit, allow_skip, in_lens)
    nll = _nll_from_alpha(alpha, in_lens, label_lens)
    return nll, (log_probs.shape[2], ext, allow_skip, emit, alpha, in_lens,
                 label_lens)


def _bwd(blank_id, res, g):
    (V, ext, allow_skip, emit, alpha, in_lens, label_lens) = res
    B, T, S = emit.shape
    beta = _beta_all(emit, allow_skip, in_lens, label_lens)
    # occupancy posterior γ(t,s) = exp(α + β − emit − logZ); logZ = −nll
    log_z = -_nll_from_alpha(alpha, in_lens, label_lens)      # (B,)
    gamma = jnp.exp(
        jnp.clip(alpha + beta - emit - log_z[:, None, None], -80.0, 80.0)
    )
    t_idx = jnp.arange(T)[None, :, None]
    gamma = jnp.where(t_idx < in_lens[:, None, None], gamma, 0.0)
    # project states → vocab with a one-hot matmul (MXU)
    onehot = jax.nn.one_hot(ext, V, dtype=gamma.dtype)        # (B, S, V)
    dlogp = -jnp.einsum(
        "bts,bsv->btv", gamma, onehot, precision=jax.lax.Precision.HIGHEST
    )
    dlogp = dlogp * g[:, None, None]
    return dlogp.astype(jnp.float32), None, None, None


ctc_nll_pallas.defvjp(_fwd, _bwd)
