"""Seed determinism: same seed → identical init and first-step loss."""

import numpy as np

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.train.step import init_train_state, make_train_step


def test_same_seed_same_loss(rng):
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "16",
        "--model.num_layers", "1", "--model.vocab_size", "16",
        "--data.batch_size", "2", "--data.target_duration", "0.5",
        "--data.batch_samplerate", "8000", "--train.seed", "7",
    ])
    model = build_model(cfg.model, 80)
    B, S, U = 2, 4000, 8
    audio = jnp.asarray(rng.uniform(-0.3, 0.3, (B, S)).astype(np.float32))
    batch = (audio, jnp.ones((B, S), jnp.bool_),
             jnp.asarray(rng.integers(1, 16, (B, U)).astype(np.int32)),
             jnp.full((B,), 4, jnp.int32), jnp.ones((B,), jnp.bool_))

    losses = []
    for _ in range(2):
        state = init_train_state(
            model, cfg, jax.random.PRNGKey(cfg.train.seed), 80, 8
        )
        step = make_train_step(model, cfg)
        _, _, out = step(state, init_carry(cfg.model, B), *batch)
        losses.append(float(out.loss))
    assert losses[0] == losses[1]


def test_different_seed_different_params():
    cfg = Config().apply_overrides([
        "--model.encoder", "lstm", "--model.hidden_size", "8",
        "--model.num_layers", "1",
    ])
    model = build_model(cfg.model, 80)
    p1 = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 8).params
    p2 = init_train_state(model, cfg, jax.random.PRNGKey(1), 80, 8).params
    differs = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))
    ]
    assert any(differs)  # (some leaves, e.g. zero-init biases, match by design)
