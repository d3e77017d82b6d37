"""Batched, jittable CTC prefix beam search with streaming state.

The reference has greedy decoding only; beam search is on its roadmap
(reference README.md:31, decoder.py).  This is a TPU-native prefix beam
search: fixed shapes throughout, all work batched over (B, W) beams, prefix
identity tracked by rolling hash, duplicate prefixes merged with a
sorted-segment logsumexp built from the same (logaddexp, +) semiring scan
used by the RNN-T lattice (ops/rnnt.py).

Streaming: ``BeamState`` is a pytree (scores, hashes, prefix buffer) that can
be carried across segment boundaries together with the encoder carry — the
decode-side twin of the training loop's state propagation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG_INF = -1e30
_HASH_P = jnp.uint32(1000003)


class BeamState(NamedTuple):
    p_b: jnp.ndarray       # (B, W) log prob of prefix ending in blank
    p_nb: jnp.ndarray      # (B, W) log prob of prefix ending in non-blank
    hashes: jnp.ndarray    # (B, W) uint32 rolling hash of prefix
    last: jnp.ndarray      # (B, W) last token of prefix (-1 if empty)
    toks: jnp.ndarray      # (B, W, Lmax) prefix tokens
    lens: jnp.ndarray      # (B, W) prefix lengths


def beam_init(batch: int, beam: int, max_len: int) -> BeamState:
    p_b = jnp.full((batch, beam), _NEG_INF).at[:, 0].set(0.0)
    return BeamState(
        p_b=p_b,
        p_nb=jnp.full((batch, beam), _NEG_INF),
        hashes=jnp.zeros((batch, beam), jnp.uint32),
        last=jnp.full((batch, beam), -1, jnp.int32),
        toks=jnp.zeros((batch, beam, max_len), jnp.int32),
        lens=jnp.zeros((batch, beam), jnp.int32),
    )


def _segment_logsumexp_sorted(vals: jnp.ndarray, seg_start: jnp.ndarray) -> jnp.ndarray:
    """Within runs (seg_start marks run beginnings), inclusive running
    logsumexp along axis 1 — via the (logaddexp, +) semiring linear scan."""
    gate = jnp.where(seg_start, _NEG_INF, 0.0)  # a=0 (log-id) within a run

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 + a2, jnp.logaddexp(b1 + a2, b2)

    _, out = lax.associative_scan(combine, (gate, vals), axis=1)
    return out


def _merge_topk(hashes, p_b, p_nb, beam):
    """Merge candidates with identical prefix hash, keep top ``beam``.

    All shapes (B, N).  Returns indices into the candidate axis (B, W) of
    the surviving representative candidates plus merged scores.
    """
    B, N = hashes.shape
    order = jnp.argsort(hashes, axis=1)
    hs = jnp.take_along_axis(hashes, order, axis=1)
    pb_s = jnp.take_along_axis(p_b, order, axis=1)
    pnb_s = jnp.take_along_axis(p_nb, order, axis=1)

    prev_h = jnp.concatenate([jnp.full((B, 1), 2**32 - 1, hs.dtype), hs[:, :-1]], axis=1)
    seg_start = hs != prev_h
    pb_run = _segment_logsumexp_sorted(pb_s, seg_start)
    pnb_run = _segment_logsumexp_sorted(pnb_s, seg_start)
    next_h = jnp.concatenate([hs[:, 1:], jnp.full((B, 1), 2**32 - 1, hs.dtype)], axis=1)
    is_end = hs != next_h       # run representative = last of run (holds full sum)

    total = jnp.logaddexp(pb_run, pnb_run)
    total = jnp.where(is_end, total, _NEG_INF)
    top_vals, top_idx = lax.top_k(total, beam)          # indices into sorted axis
    orig_idx = jnp.take_along_axis(order, top_idx, axis=1)
    pb_out = jnp.take_along_axis(pb_run, top_idx, axis=1)
    pnb_out = jnp.take_along_axis(pnb_run, top_idx, axis=1)
    pb_out = jnp.where(top_vals <= _NEG_INF / 2, _NEG_INF, pb_out)
    pnb_out = jnp.where(top_vals <= _NEG_INF / 2, _NEG_INF, pnb_out)
    return orig_idx, pb_out, pnb_out


def beam_step(state: BeamState, lp: jnp.ndarray, active: jnp.ndarray,
              beam: int, topk: int, blank_id: int) -> BeamState:
    """One frame of prefix beam search.  lp: (B, V) log-probs; active: (B,)."""
    B, W = state.p_b.shape
    Lmax = state.toks.shape[-1]
    V = lp.shape[-1]
    K = min(topk, V)

    top_lp, top_tok = lax.top_k(lp, K)                   # (B, K)
    lp_blank = lp[:, blank_id]                           # (B,)

    # ---- candidate 0 per beam: "stay" (extend by blank, or repeat last) ----
    stay_pb = jnp.logaddexp(state.p_b, state.p_nb) + lp_blank[:, None]
    # repeat of last non-blank token keeps the prefix, adds to p_nb
    last_lp = jnp.where(
        state.last >= 0,
        jnp.take_along_axis(lp, jnp.maximum(state.last, 0), axis=1),
        _NEG_INF,
    )
    stay_pnb = state.p_nb + last_lp

    # ---- K extension candidates per beam -----------------------------------
    tok = jnp.broadcast_to(top_tok[:, None, :], (B, W, K))
    tlp = jnp.broadcast_to(top_lp[:, None, :], (B, W, K))
    is_blank = tok == blank_id
    same_as_last = tok == state.last[:, :, None]
    # extending with token c: from p_b always; from p_nb only if c != last
    ext_src = jnp.where(
        same_as_last, state.p_b[:, :, None],
        jnp.logaddexp(state.p_b, state.p_nb)[:, :, None],
    )
    ext_pnb = jnp.where(is_blank, _NEG_INF, ext_src + tlp)
    ext_hash = state.hashes[:, :, None] * _HASH_P + tok.astype(jnp.uint32) + 1

    # ---- flatten candidates: stay (W) ++ extend (W·K) ----------------------
    cand_pb = jnp.concatenate([stay_pb, jnp.full((B, W * K), _NEG_INF)], axis=1)
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(B, W * K)], axis=1)
    cand_hash = jnp.concatenate([state.hashes, ext_hash.reshape(B, W * K)], axis=1)
    cand_parent = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.arange(W)[None], (B, W)),
            jnp.broadcast_to(jnp.repeat(jnp.arange(W), K)[None], (B, W * K)),
        ],
        axis=1,
    )
    cand_token = jnp.concatenate(
        [jnp.full((B, W), -1, jnp.int32), tok.reshape(B, W * K)], axis=1
    )

    idx, pb_new, pnb_new = _merge_topk(cand_hash, cand_pb, cand_pnb, W)
    parent = jnp.take_along_axis(cand_parent, idx, axis=1)
    token = jnp.take_along_axis(cand_token, idx, axis=1)
    hash_new = jnp.take_along_axis(cand_hash, idx, axis=1)

    # rebuild prefix buffers from parents (+ appended token where extension)
    toks_par = jnp.take_along_axis(
        state.toks, parent[:, :, None], axis=1
    )
    lens_par = jnp.take_along_axis(state.lens, parent, axis=1)
    last_par = jnp.take_along_axis(state.last, parent, axis=1)
    is_ext = token >= 0
    pos = jnp.minimum(lens_par, Lmax - 1)
    toks_new = jnp.where(
        is_ext[:, :, None]
        & (jax.lax.broadcasted_iota(jnp.int32, (B, W, Lmax), 2) == pos[:, :, None]),
        jnp.maximum(token, 0)[:, :, None],
        toks_par,
    )
    lens_new = jnp.where(is_ext, jnp.minimum(lens_par + 1, Lmax), lens_par)
    last_new = jnp.where(is_ext, token, last_par)

    new = BeamState(
        p_b=pb_new, p_nb=pnb_new, hashes=hash_new, last=last_new,
        toks=toks_new, lens=lens_new,
    )
    # frames past in_len: keep previous state
    keep = active[:, None]
    return BeamState(
        p_b=jnp.where(keep, new.p_b, state.p_b),
        p_nb=jnp.where(keep, new.p_nb, state.p_nb),
        hashes=jnp.where(keep, new.hashes, state.hashes),
        last=jnp.where(keep, new.last, state.last),
        toks=jnp.where(keep[:, :, None], new.toks, state.toks),
        lens=jnp.where(keep, new.lens, state.lens),
    )


@functools.partial(
    jax.jit, static_argnames=("beam", "topk", "blank_id", "max_len")
)
def ctc_beam_search(
    log_probs: jnp.ndarray,    # (B, T, V)
    in_lens: jnp.ndarray,      # (B,)
    beam: int = 8,
    topk: int = 16,
    blank_id: int = 0,
    max_len: int = 256,
    init_state: BeamState | None = None,
) -> tuple[BeamState, jnp.ndarray]:
    """Run prefix beam search over a segment.  Returns (final BeamState,
    per-beam total log-probs (B, W), sorted best-first)."""
    B, T, V = log_probs.shape
    state = init_state if init_state is not None else beam_init(B, beam, max_len)

    def step(st, inp):
        lp_t, t = inp
        st = beam_step(st, lp_t, t < in_lens, beam, topk, blank_id)
        return st, None

    state, _ = lax.scan(
        step, state, (jnp.swapaxes(log_probs, 0, 1), jnp.arange(T))
    )
    totals = jnp.logaddexp(state.p_b, state.p_nb)
    return state, totals


def _rolling_hashes(toks: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Recompute the uint32 rolling prefix hash (h = h*P + tok + 1) from
    (…, L) token buffers with (…,) lengths.  Host-side, vectorized over the
    leading axes."""
    P = np.uint32(1000003)
    h = np.zeros(toks.shape[:-1], np.uint32)
    L = toks.shape[-1]
    pos = np.arange(L)
    valid = pos < lens[..., None]
    with np.errstate(over="ignore"):
        for j in range(L):
            step = h * P + toks[..., j].astype(np.uint32) + np.uint32(1)
            h = np.where(valid[..., j], step, h)
    return h


def committed_prefix_shift(
    toks: np.ndarray,      # (B, W, L) int32
    lens: np.ndarray,      # (B, W) int32
    live: np.ndarray,      # (B, W) bool
    best: np.ndarray,      # (B,) int32 index of the best live beam per row
    reserve: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, list[list[int]]]:
    """Shared host-side core of hour-scale streaming commit.

    Computes, per batch row, the longest common prefix (LCP) of all live
    beams' token sequences, removes it from the buffers (left shift), and
    returns it as the committed emission.  Lossless: every live hypothesis
    equals ``committed ++ residual`` and residual equality ⟺ full-sequence
    equality, so downstream hash-merging is unaffected.

    ``reserve``: if set, guarantee at least ``reserve`` free buffer slots
    after the shift by FORCE-committing along the best beam when the LCP is
    too short — beams that disagree with the forced prefix are pruned
    (``live`` cleared).  This trades beam diversity for bounded memory, the
    standard streaming-commit fallback; with ``reserve=None`` the operation
    is exact.

    Returns (toks, lens, live, recomputed_hashes, committed_lists).
    """
    toks = np.array(toks, np.int32, copy=True)
    lens = np.array(lens, np.int32, copy=True)
    live = np.array(live, bool, copy=True)
    B, W, L = toks.shape
    committed: list[list[int]] = []
    for b in range(B):
        lw = np.where(live[b])[0]
        if lw.size == 0:
            committed.append([])
            continue
        ref_w = int(best[b]) if live[b, best[b]] else int(lw[0])
        ref = toks[b, ref_w, : lens[b, ref_w]]
        # LCP over live beams (a shorter live beam caps the LCP at its length)
        n = len(ref)
        for w in lw:
            m = min(n, int(lens[b, w]))
            neq = np.nonzero(toks[b, w, :m] != ref[:m])[0]
            n = int(neq[0]) if neq.size else m
            if n == 0:
                break
        commit_n = n
        if reserve is not None:
            max_live_len = int(lens[b, lw].max())
            need = max_live_len - (L - reserve)
            if need > commit_n:
                # force-commit along the best beam; prune disagreeing beams
                commit_n = min(need, int(lens[b, ref_w]))
                for w in lw:
                    if int(lens[b, w]) < commit_n or np.any(
                        toks[b, w, :commit_n] != ref[:commit_n]
                    ):
                        live[b, w] = False
        committed.append([int(x) for x in ref[:commit_n]])
        if commit_n:
            for w in range(W):
                if not live[b, w]:
                    lens[b, w] = 0
                    continue
                r = int(lens[b, w]) - commit_n
                toks[b, w, :r] = toks[b, w, commit_n : commit_n + r]
                toks[b, w, r:] = 0
                lens[b, w] = r
    hashes = _rolling_hashes(toks, lens)
    return toks, lens, live, hashes, committed


def beam_commit(
    state: BeamState, totals, reserve: int | None = None,
    return_best: bool = False,
):
    """Hour-scale streaming commit for the CTC prefix-beam state.

    Host-side: extracts the committed (all-live-beams-agree) prefix of each
    batch row, left-shifts the token buffers to free space, and returns the
    refreshed state plus the per-row committed token lists.  The full
    hypothesis of any beam is then ``sum(committed emissions) ++ residual``.
    ``last`` (the repeat-collapse context) is untouched — it is semantic
    regardless of where the buffer is cut.  With ``reserve`` set, forced
    commits prune beams that disagree with the best beam's prefix (see
    ``committed_prefix_shift``).

    This keeps decode lossless for arbitrarily long recordings (reference
    README.md:5 — hour-long context is the design goal) with a fixed-size
    device buffer.
    """
    totals_h = np.asarray(totals)
    live = totals_h > _NEG_INF / 2
    best = np.argmax(np.where(live, totals_h, -np.inf), axis=1).astype(np.int32)
    toks, lens, live2, hashes, committed = committed_prefix_shift(
        np.asarray(state.toks), np.asarray(state.lens), live, best, reserve
    )
    # scores are killed ON DEVICE — pulling p_b/p_nb to the host would cost
    # two more tunnel round trips per commit (profiled in streaming p95)
    kill = jnp.asarray(~live2)
    new = BeamState(
        p_b=jnp.where(kill, _NEG_INF, state.p_b),
        p_nb=jnp.where(kill, _NEG_INF, state.p_nb),
        hashes=jnp.asarray(hashes),
        last=state.last,
        toks=jnp.asarray(toks),
        lens=jnp.asarray(lens),
    )
    if not return_best:
        return new, committed
    # best beam's residual per row + the residual fill level, from the host
    # arrays already in hand — callers serving partial results avoid
    # re-pulling the new device state (a tunnel round trip each)
    best_resid = []
    for b in range(toks.shape[0]):
        lw = np.where(live2[b])[0]
        if lw.size == 0:
            best_resid.append([])
            continue
        w = int(best[b]) if live2[b, best[b]] else int(lw[0])
        best_resid.append([int(x) for x in toks[b, w, : lens[b, w]]])
    return new, committed, best_resid, int(lens.max())


def beam_hypotheses(state: BeamState, totals) -> list[list[tuple[float, list[int]]]]:
    """Host-side: per batch item, list of (score, tokens) best-first."""
    out = []
    totals = np.asarray(totals)
    toks = np.asarray(state.toks)
    lens = np.asarray(state.lens)
    B, W = totals.shape
    for b in range(B):
        order = np.argsort(-totals[b])
        hyps = []
        for w in order:
            if totals[b, w] <= _NEG_INF / 2:
                continue
            hyps.append((float(totals[b, w]), [int(x) for x in toks[b, w, : lens[b, w]]]))
        out.append(hyps)
    return out
