"""RNN-T greedy decode vs a plain-Python reference loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.rnnt_decode import (
    rnnt_decode_init,
    rnnt_greedy_decode,
    rnnt_state_to_lists,
)


def reference_greedy(enc_proj, pred_table, W, bias, T, blank, max_symbols):
    out = []
    last = blank
    for t in range(T):
        for _ in range(max_symbols):
            joint = np.tanh(enc_proj[t] + pred_table[last])
            logits = joint @ W + bias
            nxt = int(np.argmax(logits))
            if nxt == blank:
                break
            out.append(nxt)
            last = nxt
    return out


def _rand(rng, B=3, T=12, J=8, V=6):
    enc = rng.standard_normal((B, T, J)).astype(np.float32)
    table = rng.standard_normal((V, J)).astype(np.float32)
    W = rng.standard_normal((J, V)).astype(np.float32)
    bias = rng.standard_normal((V,)).astype(np.float32) * 0.1
    in_lens = rng.integers(3, T + 1, size=(B,)).astype(np.int32)
    return enc, table, W, bias, in_lens


def test_greedy_matches_reference(rng):
    enc, table, W, bias, in_lens = _rand(rng)
    st = rnnt_greedy_decode(
        jnp.asarray(enc), jnp.asarray(table), jnp.asarray(W), jnp.asarray(bias),
        jnp.asarray(in_lens), blank_id=0, max_symbols=3, max_out=64,
    )
    got = rnnt_state_to_lists(st)
    for b in range(enc.shape[0]):
        want = reference_greedy(enc[b], table, W, bias, int(in_lens[b]), 0, 3)
        assert got[b] == want, f"batch {b}"


def test_greedy_streaming_state_carry(rng):
    enc, table, W, bias, _ = _rand(rng, B=2, T=10)
    in_full = np.array([10, 10], np.int32)
    full = rnnt_state_to_lists(
        rnnt_greedy_decode(jnp.asarray(enc), jnp.asarray(table), jnp.asarray(W),
                           jnp.asarray(bias), jnp.asarray(in_full),
                           blank_id=0, max_symbols=3, max_out=64)
    )
    st1 = rnnt_greedy_decode(
        jnp.asarray(enc[:, :5]), jnp.asarray(table), jnp.asarray(W),
        jnp.asarray(bias), jnp.asarray([5, 5]), blank_id=0, max_symbols=3,
        max_out=64,
    )
    st2 = rnnt_greedy_decode(
        jnp.asarray(enc[:, 5:]), jnp.asarray(table), jnp.asarray(W),
        jnp.asarray(bias), jnp.asarray([5, 5]), blank_id=0, max_symbols=3,
        init_state=st1,
    )
    assert rnnt_state_to_lists(st2) == full


def test_pred_table_from_module(rng):
    from statecatcher_tpu.models.rnnt import RNNTPredictorJoiner, make_prefix

    B, T, U, V = 2, 5, 3, 8
    enc_out = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    prefix = make_prefix(labels, 0)
    pj = RNNTPredictorJoiner(vocab_size=V, enc_out_dim=V, pred_emb_dim=4, join_dim=4)
    variables = pj.init(jax.random.PRNGKey(0), enc_out, prefix)
    table, _, _ = pj.apply(variables, method=pj.decode_tables)
    # table row v equals pred_proj(embed(v))
    enc_p, pred_p, W, bias = pj.apply(variables, enc_out, prefix, method=pj.project)
    np.testing.assert_allclose(
        np.asarray(table)[np.asarray(prefix)], np.asarray(pred_p),
        rtol=1e-5, atol=1e-6,
    )


def test_beam1_equals_greedy(rng):
    from statecatcher_tpu.rnnt_decode import (
        rnnt_beam_search,
        rnnt_beam_to_lists,
    )

    enc, table, W, bias, in_lens = _rand(rng, B=3, T=10)
    greedy = rnnt_state_to_lists(
        rnnt_greedy_decode(jnp.asarray(enc), jnp.asarray(table), jnp.asarray(W),
                           jnp.asarray(bias), jnp.asarray(in_lens),
                           blank_id=0, max_symbols=3, max_out=64)
    )
    st = rnnt_beam_search(
        jnp.asarray(enc), jnp.asarray(table), jnp.asarray(W), jnp.asarray(bias),
        jnp.asarray(in_lens), blank_id=0, beam=1, topk=1, max_symbols=3,
        max_out=64,
    )
    beam = rnnt_beam_to_lists(st)
    for b in range(enc.shape[0]):
        assert beam[b][0][1] == greedy[b]


def test_beam_improves_or_matches_greedy_score(rng):
    from statecatcher_tpu.rnnt_decode import (
        rnnt_beam_search,
        rnnt_beam_to_lists,
    )

    for trial in range(3):
        enc, table, W, bias, in_lens = _rand(rng, B=2, T=8, V=5)
        st1 = rnnt_beam_search(
            jnp.asarray(enc), jnp.asarray(table), jnp.asarray(W), jnp.asarray(bias),
            jnp.asarray(in_lens), blank_id=0, beam=1, topk=1, max_symbols=2,
            max_out=32,
        )
        st8 = rnnt_beam_search(
            jnp.asarray(enc), jnp.asarray(table), jnp.asarray(W), jnp.asarray(bias),
            jnp.asarray(in_lens), blank_id=0, beam=8, topk=5, max_symbols=2,
            max_out=32,
        )
        s1 = rnnt_beam_to_lists(st1)
        s8 = rnnt_beam_to_lists(st8)
        for b in range(2):
            assert s8[b][0][0] >= s1[b][0][0] - 1e-5


def test_rnnt_beam_streaming_carry(rng):
    from statecatcher_tpu.rnnt_decode import (
        rnnt_beam_search,
        rnnt_beam_to_lists,
    )

    enc, table, W, bias, _ = _rand(rng, B=2, T=10)
    full = rnnt_beam_search(
        jnp.asarray(enc), jnp.asarray(table), jnp.asarray(W), jnp.asarray(bias),
        jnp.asarray([10, 10]), blank_id=0, beam=4, topk=3, max_symbols=2,
        max_out=32,
    )
    st1 = rnnt_beam_search(
        jnp.asarray(enc[:, :5]), jnp.asarray(table), jnp.asarray(W),
        jnp.asarray(bias), jnp.asarray([5, 5]), blank_id=0, beam=4, topk=3,
        max_symbols=2, max_out=32,
    )
    st2 = rnnt_beam_search(
        jnp.asarray(enc[:, 5:]), jnp.asarray(table), jnp.asarray(W),
        jnp.asarray(bias), jnp.asarray([5, 5]), blank_id=0, beam=4, topk=3,
        max_symbols=2, init_state=st1,
    )
    a = rnnt_beam_to_lists(full)
    b = rnnt_beam_to_lists(st2)
    for i in range(2):
        assert a[i][0][1] == b[i][0][1]
        np.testing.assert_allclose(a[i][0][0], b[i][0][0], rtol=1e-4)
