"""Group-chunking invariance: processing K segments in several fixed-size
dispatch groups (carry threaded between groups) equals one big group."""

import numpy as np

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.train.step import init_train_state, make_segment_scan_step


def test_grouped_dispatches_equal_single_group(rng):
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "16",
        "--model.num_layers", "1", "--model.vocab_size", "16",
        "--data.batch_size", "2", "--data.target_duration", "0.5",
        "--data.batch_samplerate", "8000",
    ])
    model = build_model(cfg.model, 80)
    B, S, U, K = 2, 4000, 8, 10
    audio = rng.uniform(-0.3, 0.3, (K, B, S)).astype(np.float32)
    mask = np.ones((K, B, S), bool)
    tokens = rng.integers(1, 16, (K, B, U)).astype(np.int32)
    tok_lens = np.full((K, B), 4, np.int32)
    row_valid = np.ones((K, B), bool)

    def run(groups):
        state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 8)
        carry = init_carry(cfg.model, B)
        outs_losses = []
        idx = 0
        for g in groups:
            # pad group to the first group's size with invalid segments so
            # every dispatch in this test uses distinct or same shapes freely
            step = make_segment_scan_step(model, cfg)
            sl = slice(idx, idx + g)
            idx += g
            seg_valid = np.ones((g,), bool)
            state, carry, outs = step(
                state, carry,
                jnp.asarray(audio[sl]), jnp.asarray(mask[sl]),
                jnp.asarray(tokens[sl]), jnp.asarray(tok_lens[sl]),
                jnp.asarray(row_valid[sl]), jnp.asarray(seg_valid),
            )
            outs_losses.extend(np.asarray(outs.loss).tolist())
        return state, carry, outs_losses

    s1, c1, l1 = run([10])
    s2, c2, l2 = run([4, 4, 2])
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(c1), jax.tree.leaves(c2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
