"""Optimizer-path tests: warmup+cosine schedule parity with the reference
lambda (reference train.py:147-157), MultiSteps gradient accumulation, lion."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config, OptimConfig
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.train.step import (
    build_optimizer,
    init_train_state,
    lr_schedule,
    make_train_step,
)


def reference_lr_lambda(step, warmup_steps, total_steps):
    if step < warmup_steps:
        return float(step) / float(max(1, warmup_steps))
    progress = float(step - warmup_steps) / float(max(1, total_steps - warmup_steps))
    return 0.5 * (1.0 + math.cos(math.pi * progress))


def test_lr_schedule_matches_reference():
    optim = OptimConfig(lr=3e-4, use_scheduler=True, warmup_steps=100,
                        total_steps=1000)
    fn = lr_schedule(optim)
    for step in [0, 1, 50, 99, 100, 101, 500, 999, 1000]:
        got = float(fn(jnp.asarray(step)))
        want = optim.lr * reference_lr_lambda(step, 100, 1000)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def _tiny(accum=1, optimizer="adam"):
    cfg = Config().apply_overrides([
        "--model.encoder", "lstm", "--model.hidden_size", "8",
        "--model.num_layers", "1", "--model.vocab_size", "12",
        "--data.batch_size", "2", "--data.target_duration", "0.5",
        "--data.batch_samplerate", "8000",
        "--train.optim.accumulation_steps", str(accum),
        "--train.optim.optimizer", optimizer,
    ])
    model = build_model(cfg.model, 80)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 8)
    return cfg, model, state


def test_accumulation_updates_every_k(rng):
    cfg, model, state = _tiny(accum=2)
    step = make_train_step(model, cfg)
    B, S, U = 2, 4000, 6
    batch = lambda: (
        jnp.asarray(rng.uniform(-0.3, 0.3, (B, S)).astype(np.float32)),
        jnp.ones((B, S), jnp.bool_),
        jnp.asarray(rng.integers(1, 12, (B, U)).astype(np.int32)),
        jnp.full((B,), 3, jnp.int32), jnp.ones((B,), jnp.bool_),
    )
    p0 = np.asarray(jax.tree.leaves(state.params)[1]).copy()
    carry = init_carry(cfg.model, B)
    state, carry, _ = step(state, carry, *batch())
    p1 = np.asarray(jax.tree.leaves(state.params)[1])
    # first micro-step: gradients accumulated, params unchanged
    np.testing.assert_array_equal(p0, p1)
    state, carry, _ = step(state, carry, *batch())
    p2 = np.asarray(jax.tree.leaves(state.params)[1])
    assert not np.array_equal(p1, p2)  # second micro-step applies the update


@pytest.mark.parametrize("optimizer", ["adamw", "lion"])
def test_other_optimizers_step(rng, optimizer):
    cfg, model, state = _tiny(optimizer=optimizer)
    step = make_train_step(model, cfg)
    B, S, U = 2, 4000, 6
    carry = init_carry(cfg.model, B)
    state, carry, out = step(
        state, carry,
        jnp.asarray(rng.uniform(-0.3, 0.3, (B, S)).astype(np.float32)),
        jnp.ones((B, S), jnp.bool_),
        jnp.asarray(rng.integers(1, 12, (B, U)).astype(np.int32)),
        jnp.full((B,), 3, jnp.int32), jnp.ones((B,), jnp.bool_),
    )
    assert np.isfinite(float(out.loss))
