"""RNN-T greedy decoding — batched, jittable.

Standard transducer greedy search: at each frame, emit the argmax label and
re-query the joint with the updated predictor context until blank (bounded by
``max_symbols`` per frame).  The reference's predictor is a 1-token embedding
(reference model.py:112-145), so decoder context is exactly the last emitted
token — precomputed as a (V, J) table so each emission is one (B,J)×(J,V)
matmul.

Carried decode state across segments: (last_token, out_len, out_buf) —
streaming twin of the encoder carry.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class RNNTDecodeState(NamedTuple):
    last_token: jnp.ndarray   # (B,) int32 — predictor context (blank at start)
    out_buf: jnp.ndarray      # (B, max_out) int32
    out_len: jnp.ndarray      # (B,) int32


def rnnt_decode_init(batch: int, max_out: int, blank_id: int) -> RNNTDecodeState:
    return RNNTDecodeState(
        last_token=jnp.full((batch,), blank_id, jnp.int32),
        out_buf=jnp.zeros((batch, max_out), jnp.int32),
        out_len=jnp.zeros((batch,), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("blank_id", "max_symbols", "max_out"))
def rnnt_greedy_decode(
    enc_proj: jnp.ndarray,     # (B, T, J) encoder projected to join space
    pred_table: jnp.ndarray,   # (V, J)
    join_kernel: jnp.ndarray,  # (J, V)
    join_bias: jnp.ndarray,    # (V,)
    in_lens: jnp.ndarray,      # (B,)
    blank_id: int = 0,
    max_symbols: int = 4,
    init_state: Optional[RNNTDecodeState] = None,
    max_out: int = 512,
) -> RNNTDecodeState:
    B, T, J = enc_proj.shape
    state = init_state if init_state is not None else rnnt_decode_init(
        B, max_out, blank_id
    )
    Mo = state.out_buf.shape[1]

    def frame(st: RNNTDecodeState, inp):
        enc_t, t = inp                         # (B, J), scalar
        active0 = t < in_lens

        def sym_step(i, carry):
            st, can_emit = carry
            pred = pred_table[st.last_token]   # (B, J)
            joint = jnp.tanh(enc_t + pred)
            logits = joint @ join_kernel + join_bias
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = can_emit & (nxt != blank_id) & (st.out_len < Mo)
            pos = jnp.minimum(st.out_len, Mo - 1)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (B, Mo), 1) == pos[:, None]
            ) & emit[:, None]
            out_buf = jnp.where(onehot, nxt[:, None], st.out_buf)
            out_len = st.out_len + emit.astype(jnp.int32)
            last = jnp.where(emit, nxt, st.last_token)
            return (
                RNNTDecodeState(last_token=last, out_buf=out_buf, out_len=out_len),
                emit,   # a row stops emitting this frame once it hits blank
            )

        st, _ = lax.fori_loop(0, max_symbols, sym_step, (st, active0))
        return st, None

    state, _ = lax.scan(
        frame, state, (jnp.swapaxes(enc_proj, 0, 1), jnp.arange(T))
    )
    return state


def rnnt_state_to_lists(state: RNNTDecodeState) -> list[list[int]]:
    buf = np.asarray(state.out_buf)
    lens = np.asarray(state.out_len)
    return [[int(x) for x in buf[b, : lens[b]]] for b in range(buf.shape[0])]


def rnnt_drain(state: RNNTDecodeState) -> tuple[RNNTDecodeState, list[list[int]]]:
    """Hour-scale streaming commit for greedy RNN-T: drain the emitted
    tokens to the host and reset the buffer cursor.  Exactly lossless — the
    only decode context the next frame needs is ``last_token``, which is
    kept.  Call between segments so the fixed buffer only ever has to hold
    ONE segment's emissions (reference README.md:5 — hour-long recordings)."""
    committed = rnnt_state_to_lists(state)
    return (
        RNNTDecodeState(
            last_token=state.last_token,
            out_buf=jnp.zeros_like(state.out_buf),
            out_len=jnp.zeros_like(state.out_len),
        ),
        committed,
    )


# --------------------------------------------------------------------------- #
# Beam search
# --------------------------------------------------------------------------- #
class RNNTBeamState(NamedTuple):
    """W hypotheses per utterance, mergeable by rolling prefix hash."""

    scores: jnp.ndarray      # (B, W) log prob of each hypothesis
    last_token: jnp.ndarray  # (B, W)
    hashes: jnp.ndarray      # (B, W) uint32
    toks: jnp.ndarray        # (B, W, Lmax)
    lens: jnp.ndarray        # (B, W)


_HASH_P = jnp.uint32(1000003)


def rnnt_beam_init(batch: int, beam: int, max_out: int, blank_id: int) -> RNNTBeamState:
    scores = jnp.full((batch, beam), -1e30).at[:, 0].set(0.0)
    return RNNTBeamState(
        scores=scores,
        last_token=jnp.full((batch, beam), blank_id, jnp.int32),
        hashes=jnp.zeros((batch, beam), jnp.uint32),
        toks=jnp.zeros((batch, beam, max_out), jnp.int32),
        lens=jnp.zeros((batch, beam), jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("blank_id", "beam", "topk", "max_symbols", "max_out")
)
def rnnt_beam_search(
    enc_proj: jnp.ndarray,     # (B, T, J)
    pred_table: jnp.ndarray,   # (V, J)
    join_kernel: jnp.ndarray,  # (J, V)
    join_bias: jnp.ndarray,    # (V,)
    in_lens: jnp.ndarray,
    blank_id: int = 0,
    beam: int = 4,
    topk: int = 4,
    max_symbols: int = 3,
    init_state: Optional["RNNTBeamState"] = None,
    max_out: int = 512,
):
    """Batched time-synchronous RNN-T beam search.

    Per frame, each hypothesis expands ``max_symbols`` rounds: blank keeps
    the hypothesis (advancing to the next frame), a label emission extends
    it; duplicate label sequences merge by hash (logaddexp of scores).
    Returns the final RNNTBeamState, hypotheses sorted by pruning only (use
    ``rnnt_beam_to_lists`` to rank).
    """
    B, T, J = enc_proj.shape
    V = pred_table.shape[0]
    K = min(topk, V)
    st = init_state if init_state is not None else rnnt_beam_init(
        B, beam, max_out, blank_id
    )
    W = st.scores.shape[1]
    Mo = st.toks.shape[2]

    def merge_dedup(scores, hashes, parent, token):
        """Merge equal-hash candidates (logaddexp), keep top W."""
        N = scores.shape[1]
        order = jnp.argsort(hashes, axis=1)
        hs = jnp.take_along_axis(hashes, order, axis=1)
        sc = jnp.take_along_axis(scores, order, axis=1)
        prev = jnp.concatenate(
            [jnp.full((B, 1), 2**32 - 1, hs.dtype), hs[:, :-1]], axis=1
        )
        start = hs != prev
        gate = jnp.where(start, -1e30, 0.0)

        def comb(x, y):
            a1, b1 = x
            a2, b2 = y
            return a1 + a2, jnp.logaddexp(b1 + a2, b2)

        _, run = lax.associative_scan(comb, (gate, sc), axis=1)
        nxt = jnp.concatenate(
            [hs[:, 1:], jnp.full((B, 1), 2**32 - 1, hs.dtype)], axis=1
        )
        is_end = hs != nxt
        run = jnp.where(is_end, run, -1e30)
        top_vals, top_idx = lax.top_k(run, W)
        orig = jnp.take_along_axis(order, top_idx, axis=1)
        return top_vals, orig

    def frame(st: RNNTBeamState, inp):
        enc_t, t = inp
        active = (t < in_lens)[:, None]

        def sym_round(_, carry):
            st, frontier = carry       # frontier: (B, W) True = may still emit
            pred = pred_table[st.last_token]          # (B, W, J)
            joint = jnp.tanh(enc_t[:, None, :] + pred)
            logits = joint @ join_kernel + join_bias  # (B, W, V)
            logp = jax.nn.log_softmax(logits, axis=-1)

            # stay candidates: advance via blank
            stay = st.scores + jnp.where(
                frontier, logp[..., blank_id], 0.0
            )
            # expand candidates (only for frontier hypotheses)
            lp_k, tok_k = lax.top_k(logp, K)          # (B, W, K)
            ext_scores = jnp.where(
                frontier[:, :, None] & (tok_k != blank_id) & (st.lens[:, :, None] < Mo),
                st.scores[:, :, None] + lp_k, -1e30,
            )
            ext_hash = st.hashes[:, :, None] * _HASH_P + tok_k.astype(jnp.uint32) + 1

            cand_scores = jnp.concatenate(
                [stay, ext_scores.reshape(B, W * K)], axis=1
            )
            cand_hash = jnp.concatenate(
                [st.hashes, ext_hash.reshape(B, W * K)], axis=1
            )
            cand_parent = jnp.concatenate(
                [jnp.broadcast_to(jnp.arange(W)[None], (B, W)),
                 jnp.broadcast_to(jnp.repeat(jnp.arange(W), K)[None], (B, W * K))],
                axis=1,
            )
            cand_token = jnp.concatenate(
                [jnp.full((B, W), -1, jnp.int32), tok_k.reshape(B, W * K)], axis=1
            )

            new_scores, idx = merge_dedup(cand_scores, cand_hash, cand_parent,
                                          cand_token)
            parent = jnp.take_along_axis(cand_parent, idx, axis=1)
            token = jnp.take_along_axis(cand_token, idx, axis=1)
            hashes = jnp.take_along_axis(cand_hash, idx, axis=1)

            toks_par = jnp.take_along_axis(st.toks, parent[:, :, None], axis=1)
            lens_par = jnp.take_along_axis(st.lens, parent, axis=1)
            last_par = jnp.take_along_axis(st.last_token, parent, axis=1)
            is_ext = token >= 0
            pos = jnp.minimum(lens_par, Mo - 1)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (B, W, Mo), 2) == pos[:, :, None]
            ) & is_ext[:, :, None]
            toks_new = jnp.where(onehot, jnp.maximum(token, 0)[:, :, None], toks_par)
            lens_new = jnp.where(is_ext, jnp.minimum(lens_par + 1, Mo), lens_par)
            last_new = jnp.where(is_ext, token, last_par)
            frontier_new = jnp.take_along_axis(frontier, parent, axis=1) & is_ext

            new = RNNTBeamState(
                scores=new_scores, last_token=last_new, hashes=hashes,
                toks=toks_new, lens=lens_new,
            )
            keep = active
            st = RNNTBeamState(
                scores=jnp.where(keep, new.scores, st.scores),
                last_token=jnp.where(keep, new.last_token, st.last_token),
                hashes=jnp.where(keep, new.hashes, st.hashes),
                toks=jnp.where(keep[:, :, None], new.toks, st.toks),
                lens=jnp.where(keep, new.lens, st.lens),
            )
            frontier = jnp.where(active, frontier_new, frontier)
            return st, frontier

        frontier0 = jnp.ones((B, W), bool)
        st, _ = lax.fori_loop(0, max_symbols, sym_round, (st, frontier0))
        return st, None

    st, _ = lax.scan(frame, st, (jnp.swapaxes(enc_proj, 0, 1), jnp.arange(T)))
    return st


def rnnt_beam_commit(
    state: RNNTBeamState, reserve: int | None = None
) -> tuple[RNNTBeamState, list[list[int]]]:
    """Hour-scale streaming commit for the RNN-T beam state: emit the prefix
    all live beams agree on, left-shift the token buffers, recompute the
    residual rolling hashes (equality preserved — the committed prefix is
    common to every live beam).  ``last_token`` (predictor context) is
    semantic and untouched.  See ``beam.committed_prefix_shift`` for the
    forced-commit semantics of ``reserve``."""
    from statecatcher_tpu.beam import committed_prefix_shift

    scores_h = np.asarray(state.scores)
    live = scores_h > -1e29
    best = np.argmax(np.where(live, scores_h, -np.inf), axis=1).astype(np.int32)
    toks, lens, live2, hashes, committed = committed_prefix_shift(
        np.asarray(state.toks), np.asarray(state.lens), live, best, reserve
    )
    scores = np.array(scores_h, copy=True)
    scores[~live2] = -1e30
    new = RNNTBeamState(
        scores=jnp.asarray(scores),
        last_token=state.last_token,
        hashes=jnp.asarray(hashes),
        toks=jnp.asarray(toks),
        lens=jnp.asarray(lens),
    )
    return new, committed


def rnnt_beam_to_lists(state: RNNTBeamState) -> list[list[tuple[float, list[int]]]]:
    scores = np.asarray(state.scores)
    toks = np.asarray(state.toks)
    lens = np.asarray(state.lens)
    out = []
    for b in range(scores.shape[0]):
        order = np.argsort(-scores[b])
        hyps = []
        for w in order:
            if scores[b, w] <= -1e29:
                continue
            hyps.append((float(scores[b, w]), [int(x) for x in toks[b, w, : lens[b, w]]]))
        out.append(hyps)
    return out
