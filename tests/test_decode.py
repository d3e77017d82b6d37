import numpy as np

import jax.numpy as jnp

from statecatcher_tpu.decode import ctc_greedy_decode_to_lists


def reference_greedy(log_probs, in_lens, blank=0):
    """Loop re-statement of reference decoder.py:3-30."""
    preds = np.argmax(log_probs, axis=-1)
    out = []
    for b in range(preds.shape[0]):
        pred = preds[b, : in_lens[b]]
        prev = None
        toks = []
        for token in pred:
            token = int(token)
            if token != blank and token != prev:
                toks.append(token)
            prev = token
        out.append(toks)
    return out


def test_greedy_matches_reference_loop(rng):
    B, T, V = 4, 25, 7
    lp = rng.standard_normal((B, T, V)).astype(np.float32)
    in_lens = rng.integers(1, T + 1, size=(B,)).astype(np.int32)
    got = ctc_greedy_decode_to_lists(jnp.asarray(lp), jnp.asarray(in_lens))
    want = reference_greedy(lp, in_lens)
    assert got == want


def test_greedy_collapses_and_drops_blanks():
    # tokens over time: blank,1,1,2,blank,2 → decode [1,2,2]
    V = 3
    seq = [0, 1, 1, 2, 0, 2]
    lp = np.full((1, len(seq), V), -10.0, np.float32)
    for t, s in enumerate(seq):
        lp[0, t, s] = 0.0
    got = ctc_greedy_decode_to_lists(jnp.asarray(lp), jnp.asarray([len(seq)]))
    assert got == [[1, 2, 2]]
