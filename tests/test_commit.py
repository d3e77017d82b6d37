"""Hour-scale decode commit tests (VERDICT r4 item 3).

The device-side decode states have fixed-size token buffers (512 by
default); the commit machinery (beam.beam_commit, rnnt_decode.rnnt_drain /
rnnt_beam_commit) emits the prefix all live beams agree on to the host and
left-shifts the buffers, so arbitrarily long recordings (reference
README.md:5 — hour-long context is the headline) decode losslessly.

Each test decodes a synthetic stream that emits MORE than 512 tokens,
segment by segment with small buffers + commits, and requires an EXACT
match with the unbounded single-pass decode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from statecatcher_tpu.beam import (
    BeamState,
    beam_commit,
    beam_hypotheses,
    beam_init,
    ctc_beam_search,
)
from statecatcher_tpu.rnnt_decode import (
    rnnt_beam_commit,
    rnnt_beam_init,
    rnnt_beam_search,
    rnnt_beam_to_lists,
    rnnt_decode_init,
    rnnt_drain,
    rnnt_greedy_decode,
    rnnt_state_to_lists,
)

V = 12          # vocab (blank = 0)
N_TOK = 600     # > 512 — past the old buffer capacity


def _long_token_seq(rng, n=N_TOK):
    """n tokens in 1..V-1, consecutive entries distinct (CTC-collapse safe)."""
    seq = []
    prev = 0
    for _ in range(n):
        t = int(rng.integers(1, V))
        if t == prev:
            t = t % (V - 1) + 1
        seq.append(t)
        prev = t
    return seq


def _ctc_logits(seq):
    """Confident frame log-probs: [tok, tok, blank] frames per token."""
    frames = []
    for t in seq:
        frames += [t, t, 0]
    T = len(frames)
    x = np.full((T, V), -4.0, np.float32)
    x[np.arange(T), frames] = 4.0
    x = x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))
    return x


def test_ctc_beam_commit_long_stream(rng):
    seq = _long_token_seq(rng)
    lp = _ctc_logits(seq)
    T = lp.shape[0]

    # unbounded single pass (big enough buffer for the full hypothesis)
    full_st, full_tot = ctc_beam_search(
        jnp.asarray(lp[None]), jnp.asarray([T]), beam=8, topk=V,
        max_len=1024,
    )
    full = beam_hypotheses(full_st, full_tot)[0][0][1]
    assert full == seq          # sanity: the stream is actually decodable
    assert len(full) > 512      # the old fixed buffer would have corrupted it

    # segmented with a SMALL buffer + commit between segments
    seg_T, max_len = 150, 128
    committed: list[int] = []
    st = beam_init(1, 8, max_len)
    tot = None
    for s0 in range(0, T, seg_T):
        lp_s = lp[s0 : s0 + seg_T]
        st, tot = ctc_beam_search(
            jnp.asarray(lp_s[None]), jnp.asarray([lp_s.shape[0]]),
            beam=8, topk=V, max_len=max_len, init_state=st,
        )
        st, com = beam_commit(st, tot, reserve=max_len // 2)
        tot = jnp.logaddexp(st.p_b, st.p_nb)
        committed.extend(com[0])
        assert int(jnp.max(st.lens)) <= max_len // 2
    resid = beam_hypotheses(st, tot)[0][0][1]
    assert committed + resid == full


def _rnnt_tables():
    """Joint tables that deterministically emit each frame's token once:
    enc_t = 2*e_v; pred[v] = e_blank - 4*e_v; logits = 30*tanh(enc+pred).
    With context=blank the frame token wins (30*tanh(2) ≈ 28.9 vs 0); after
    emitting it the context suppresses a re-emit (-28.9) and blank wins
    (30*tanh(1) ≈ 22.8); the next frame's (distinct) token beats blank
    (28.9 > 22.8).  Gaps ≥ 6 in logit space → confident softmax, so beam
    search converges onto the greedy path."""
    pred = np.zeros((V, V), np.float32)
    for v in range(1, V):
        pred[v, 0] = 1.0
        pred[v, v] = -4.0
    join_kernel = 30.0 * np.eye(V, dtype=np.float32)
    join_bias = np.zeros(V, np.float32)
    return jnp.asarray(pred), jnp.asarray(join_kernel), jnp.asarray(join_bias)


def _rnnt_enc(seq):
    enc = np.zeros((1, len(seq), V), np.float32)
    enc[0, np.arange(len(seq)), seq] = 2.0
    return jnp.asarray(enc)


def test_rnnt_greedy_drain_long_stream(rng):
    seq = _long_token_seq(rng)
    pred, jk, jb = _rnnt_tables()
    enc = _rnnt_enc(seq)
    T = len(seq)

    full = rnnt_greedy_decode(
        enc, pred, jk, jb, jnp.asarray([T]),
        init_state=rnnt_decode_init(1, 1024, 0),
    )
    full_toks = rnnt_state_to_lists(full)[0]
    assert full_toks == seq
    assert len(full_toks) > 512

    seg_T, max_out = 150, 256
    st = rnnt_decode_init(1, max_out, 0)
    committed: list[int] = []
    for s0 in range(0, T, seg_T):
        enc_s = enc[:, s0 : s0 + seg_T]
        st = rnnt_greedy_decode(
            enc_s, pred, jk, jb, jnp.asarray([enc_s.shape[1]]), init_state=st,
        )
        st, com = rnnt_drain(st)
        committed.extend(com[0])
    assert committed == full_toks


def test_rnnt_beam_commit_long_stream(rng):
    seq = _long_token_seq(rng)
    pred, jk, jb = _rnnt_tables()
    enc = _rnnt_enc(seq)
    T = len(seq)

    full = rnnt_beam_search(
        enc, pred, jk, jb, jnp.asarray([T]), beam=4, topk=4,
        init_state=rnnt_beam_init(1, 4, 1024, 0),
    )
    full_toks = rnnt_beam_to_lists(full)[0][0][1]
    assert full_toks == seq
    assert len(full_toks) > 512

    seg_T, max_out = 150, 256
    st = rnnt_beam_init(1, 4, max_out, 0)
    committed: list[int] = []
    for s0 in range(0, T, seg_T):
        enc_s = enc[:, s0 : s0 + seg_T]
        st = rnnt_beam_search(
            enc_s, pred, jk, jb, jnp.asarray([enc_s.shape[1]]),
            beam=4, topk=4, init_state=st,
        )
        st, com = rnnt_beam_commit(st, reserve=170)
        committed.extend(com[0])
        assert int(jnp.max(st.lens)) <= max_out - 170
    resid = rnnt_beam_to_lists(st)[0][0][1]
    assert committed + resid == full_toks


def test_beam_commit_lcp_only_is_exact(rng):
    """Without ``reserve`` the commit is the pure LCP — state equality:
    committing then continuing gives bit-identical hypotheses and scores to
    never committing."""
    seq = _long_token_seq(rng, 40)
    lp = _ctc_logits(seq)
    T = lp.shape[0]
    st_a, tot_a = ctc_beam_search(
        jnp.asarray(lp[None, : T // 2]), jnp.asarray([T // 2]),
        beam=8, topk=V, max_len=256,
    )
    st_b, com = beam_commit(st_a, tot_a)      # no reserve: exact
    assert len(com[0]) > 0
    fin_a, ta = ctc_beam_search(
        jnp.asarray(lp[None, T // 2 :]), jnp.asarray([T - T // 2]),
        beam=8, topk=V, max_len=256, init_state=st_a,
    )
    fin_b, tb = ctc_beam_search(
        jnp.asarray(lp[None, T // 2 :]), jnp.asarray([T - T // 2]),
        beam=8, topk=V, max_len=256, init_state=st_b,
    )
    hyp_a = beam_hypotheses(fin_a, ta)[0]
    hyp_b = beam_hypotheses(fin_b, tb)[0]
    assert len(hyp_a) == len(hyp_b)
    for (sa, tka), (sb, tkb) in zip(hyp_a, hyp_b):
        assert com[0] + tkb == tka
        np.testing.assert_allclose(sa, sb, rtol=1e-6, atol=1e-6)


def test_beam_commit_forced_prunes_disagreeing_beams():
    """reserve forcing: when live beams disagree at position 0, the best
    beam's prefix is committed and disagreeing beams are pruned."""
    L = 8
    st = beam_init(1, 4, L)
    toks = np.zeros((1, 4, L), np.int32)
    toks[0, 0, :7] = [1, 2, 3, 4, 5, 6, 7]
    toks[0, 1, :7] = [9, 2, 3, 4, 5, 6, 7]     # disagrees at position 0
    toks[0, 2, :6] = [1, 2, 3, 4, 5, 6]        # prefix of best — survives
    lens = np.array([[7, 7, 6, 0]], np.int32)
    p_nb = np.array([[-1.0, -2.0, -3.0, -1e30]], np.float32)
    st = BeamState(
        p_b=jnp.full((1, 4), -1e30),
        p_nb=jnp.asarray(p_nb),
        hashes=st.hashes, last=st.last,
        toks=jnp.asarray(toks), lens=jnp.asarray(lens),
    )
    totals = jnp.logaddexp(st.p_b, st.p_nb)
    # need max_len - reserve = 2 residual slots → forced commit of 5
    new, com = beam_commit(st, totals, reserve=L - 2)
    assert com[0] == [1, 2, 3, 4, 5]
    new_tot = np.asarray(jnp.logaddexp(new.p_b, new.p_nb))[0]
    assert new_tot[0] > -1e29            # best survives
    assert new_tot[1] <= -1e29           # disagreeing beam pruned
    assert new_tot[2] > -1e29            # longer-agreeing... prefix survives
    assert np.asarray(new.lens)[0].tolist() == [2, 0, 1, 0]
    assert np.asarray(new.toks)[0, 0, :2].tolist() == [6, 7]
    assert np.asarray(new.toks)[0, 2, :1].tolist() == [6]
