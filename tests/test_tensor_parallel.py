"""Tensor-parallel sharding: gate projections shard on 'model'; forward
matches the unsharded model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from statecatcher_tpu.config import Config, MeshConfig
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.parallel.mesh import make_mesh_plan, shard_params_tp


def test_tp_forward_matches_unsharded(rng):
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "64",
        "--model.num_layers", "2", "--model.vocab_size", "32",
    ])
    model = build_model(cfg.model, 16)
    B, T = 4, 24
    x = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    carry = init_carry(cfg.model, B)
    params = model.init(jax.random.PRNGKey(0), x, carry)
    y_ref, st_ref = model.apply(params, x, carry)

    plan = make_mesh_plan(
        MeshConfig(data_parallel=4, model_parallel=2), jax.devices()[:8]
    )
    params_tp = shard_params_tp(params, plan)
    # gate projections actually sharded on 'model'
    gp = params_tp["params"]["encoder"]["track0_layer0"]["gate_proj"]["kernel"]
    assert gp.sharding.spec == P(None, "model")

    x_sh = plan.shard_batch(x)
    carry_sh = plan.shard_batch(carry)
    y_tp, st_tp = jax.jit(model.apply)(params_tp, x_sh, carry_sh)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_tp),
                               rtol=1e-4, atol=1e-5)
    # s accumulates over T (values reach O(1e2)); sharded-vs-unsharded FP
    # reduction order differs, so compare relatively
    np.testing.assert_allclose(np.asarray(st_ref["s"]), np.asarray(st_tp["s"]),
                               rtol=1e-3, atol=1e-3)


def test_tp_train_step(rng):
    """Full segment-scan train step with data×model mesh executes and matches
    the unsharded loss."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from statecatcher_tpu.train.step import init_train_state, make_segment_scan_step

    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "32",
        "--model.num_layers", "1", "--model.vocab_size", "32",
        "--data.batch_size", "8", "--data.target_duration", "0.5",
        "--data.batch_samplerate", "8000",
    ])
    model = build_model(cfg.model, 80)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 16)
    B, K, S, U = 8, 2, 4000, 16
    batch = (
        jnp.asarray(rng.uniform(-0.3, 0.3, (K, B, S)).astype(np.float32)),
        jnp.ones((K, B, S), jnp.bool_),
        jnp.asarray(rng.integers(1, 32, (K, B, U)).astype(np.int32)),
        jnp.full((K, B), 5, jnp.int32),
        jnp.ones((K, B), jnp.bool_),
        jnp.ones((K,), jnp.bool_),
    )
    step1 = make_segment_scan_step(model, cfg)
    _, _, o1 = step1(state, init_carry(cfg.model, B), *batch)

    plan = make_mesh_plan(
        MeshConfig(data_parallel=4, model_parallel=2), jax.devices()[:8]
    )
    stepN = make_segment_scan_step(model, cfg, mesh_plan=plan)
    state2 = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 16)
    state2 = state2.replace(params=shard_params_tp(state2.params, plan))
    _, _, oN = stepN(state2, init_carry(cfg.model, B), *batch)
    np.testing.assert_allclose(np.asarray(o1.loss), np.asarray(oN.loss),
                               rtol=1e-4, atol=1e-5)
