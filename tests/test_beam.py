"""CTC prefix beam search tests vs a plain-Python reference implementation."""

import math
from collections import defaultdict

import numpy as np
import pytest

import jax.numpy as jnp

from statecatcher_tpu.beam import beam_hypotheses, beam_init, ctc_beam_search
from statecatcher_tpu.decode import ctc_greedy_decode_to_lists


def reference_prefix_beam(log_probs, beam, blank=0):
    """Textbook prefix beam search (dict-based, host Python)."""
    T, V = log_probs.shape
    NEG = -1e30

    def lse(*xs):
        m = max(xs)
        if m <= NEG / 2:
            return NEG
        return m + math.log(sum(math.exp(x - m) for x in xs))

    beams = {(): (0.0, NEG)}  # prefix -> (p_b, p_nb)
    for t in range(T):
        new = defaultdict(lambda: (NEG, NEG))
        for prefix, (p_b, p_nb) in beams.items():
            total = lse(p_b, p_nb)
            # blank
            nb, nn = new[prefix]
            new[prefix] = (lse(nb, total + log_probs[t, blank]), nn)
            # repeat last
            if prefix:
                last = prefix[-1]
                nb, nn = new[prefix]
                new[prefix] = (nb, lse(nn, p_nb + log_probs[t, last]))
            for c in range(V):
                if c == blank:
                    continue
                np_ = prefix + (c,)
                src = p_b if prefix and c == prefix[-1] else total
                nb, nn = new[np_]
                new[np_] = (nb, lse(nn, src + log_probs[t, c]))
        beams = dict(
            sorted(new.items(), key=lambda kv: -lse(*kv[1]))[:beam]
        )
    ranked = sorted(beams.items(), key=lambda kv: -lse(*kv[1]))
    return [(lse(*v), list(k)) for k, v in ranked]


def _logp(rng, T, V, peaky=0.0):
    x = rng.standard_normal((T, V)).astype(np.float32) + peaky
    x = x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))
    return x


def test_beam_matches_reference_top1(rng):
    for trial in range(8):
        T, V = 6, 4
        lp = _logp(rng, T, V)
        want = reference_prefix_beam(lp, beam=16)
        state, totals = ctc_beam_search(
            jnp.asarray(lp[None]), jnp.asarray([T]), beam=16, topk=V, max_len=16
        )
        got = beam_hypotheses(state, totals)[0]
        assert got[0][1] == want[0][1], f"trial {trial}"
        np.testing.assert_allclose(got[0][0], want[0][0], rtol=1e-3, atol=1e-3)


def test_beam_matches_reference_topk_scores(rng):
    T, V = 5, 3
    lp = _logp(rng, T, V)
    want = reference_prefix_beam(lp, beam=8)
    state, totals = ctc_beam_search(
        jnp.asarray(lp[None]), jnp.asarray([T]), beam=8, topk=V, max_len=8
    )
    got = beam_hypotheses(state, totals)[0]
    for (gs, gt), (ws, wt) in zip(got[:3], want[:3]):
        assert gt == wt
        np.testing.assert_allclose(gs, ws, rtol=1e-3, atol=1e-3)


def test_beam_beats_or_matches_greedy(rng):
    B, T, V = 3, 12, 6
    lp = np.stack([_logp(rng, T, V) for _ in range(B)])
    in_lens = np.array([12, 8, 5], np.int32)
    state, totals = ctc_beam_search(
        jnp.asarray(lp), jnp.asarray(in_lens), beam=8, topk=V, max_len=32
    )
    hyps = beam_hypotheses(state, totals)
    greedy = ctc_greedy_decode_to_lists(jnp.asarray(lp), jnp.asarray(in_lens))

    def path_score(lp_b, L, labels):
        """exact log P(labels | CTC) via forward DP (independent check)."""
        S = 2 * len(labels) + 1
        ext = [0] * S
        for i, l in enumerate(labels):
            ext[2 * i + 1] = l
        NEG = -1e30
        alpha = [NEG] * S
        alpha[0] = lp_b[0][0]
        if len(labels):
            alpha[1] = lp_b[0][ext[1]]
        for t in range(1, L):
            prev = alpha[:]
            for s in range(S):
                cands = [prev[s]]
                if s >= 1:
                    cands.append(prev[s - 1])
                if s >= 2 and ext[s] != 0 and ext[s] != ext[s - 2]:
                    cands.append(prev[s - 2])
                m = max(cands)
                alpha[s] = (m + math.log(sum(math.exp(c - m) for c in cands))
                            if m > NEG / 2 else NEG) + lp_b[t][ext[s]]
        ends = [alpha[S - 1]] + ([alpha[S - 2]] if len(labels) else [])
        m = max(ends)
        return m + math.log(sum(math.exp(e - m) for e in ends))

    for b in range(B):
        beam_best = hyps[b][0][1]
        sc_beam = path_score(lp[b], int(in_lens[b]), beam_best)
        sc_greedy = path_score(lp[b], int(in_lens[b]), greedy[b])
        assert sc_beam >= sc_greedy - 1e-6


def test_beam_streaming_state_carry(rng):
    """Beam state carried across two segments == one full pass."""
    T, V = 8, 4
    lp = _logp(rng, T, V)
    full_state, full_tot = ctc_beam_search(
        jnp.asarray(lp[None]), jnp.asarray([T]), beam=8, topk=V, max_len=16
    )
    st1, _ = ctc_beam_search(
        jnp.asarray(lp[None, :4]), jnp.asarray([4]), beam=8, topk=V, max_len=16
    )
    st2, tot2 = ctc_beam_search(
        jnp.asarray(lp[None, 4:]), jnp.asarray([4]), beam=8, topk=V, max_len=16,
        init_state=st1,
    )
    full = beam_hypotheses(full_state, full_tot)[0]
    stream = beam_hypotheses(st2, tot2)[0]
    assert full[0][1] == stream[0][1]
    np.testing.assert_allclose(full[0][0], stream[0][0], rtol=1e-3, atol=1e-3)
