"""Multi-chip parity: the sharded train step on an 8-device mesh produces the
same loss/params as the single-device step (SURVEY.md §4d)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from statecatcher_tpu.config import Config, MeshConfig
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.parallel.mesh import make_mesh_plan
from statecatcher_tpu.train.step import (
    init_train_state,
    make_segment_scan_step,
)


def _setup(B):
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "32",
        "--model.num_layers", "2", "--model.vocab_size", "32",
        "--data.batch_size", str(B), "--data.target_duration", "0.5",
        "--data.batch_samplerate", "8000",
    ])
    model = build_model(cfg.model, 80)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 16)
    return cfg, model, state


def _batch(rng, K, B, S, U=16):
    audio = jnp.asarray(rng.uniform(-0.3, 0.3, (K, B, S)).astype(np.float32))
    mask = jnp.ones((K, B, S), jnp.bool_)
    tokens = jnp.asarray(rng.integers(1, 32, (K, B, U)).astype(np.int32))
    tok_lens = jnp.full((K, B), 5, jnp.int32)
    row_valid = jnp.ones((K, B), jnp.bool_)
    seg_valid = jnp.ones((K,), jnp.bool_)
    return audio, mask, tokens, tok_lens, row_valid, seg_valid


@pytest.mark.parametrize("n_devices", [8])
def test_sharded_step_matches_single_device(rng, n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip(f"need {n_devices} devices")
    B = 2 * n_devices
    K = 2
    cfg, model, state0 = _setup(B)
    S = int(0.5 * 8000)
    batch = _batch(rng, K, B, S)
    carry0 = init_carry(cfg.model, B)

    # single device
    step1 = make_segment_scan_step(model, cfg, blank_id=0)
    s1, c1, o1 = step1(state0, carry0, *batch)

    # 8-device mesh, batch-sharded
    plan = make_mesh_plan(MeshConfig(data_parallel=n_devices), jax.devices()[:n_devices])
    seg_sh = NamedSharding(plan.mesh, P(None, "data"))
    stepN = make_segment_scan_step(model, cfg, blank_id=0, mesh_plan=plan)
    cfgN, modelN, stateN = _setup(B)
    stateN = plan.shard_replicated(stateN)
    carryN = plan.shard_batch(init_carry(cfg.model, B))
    batchN = [jax.device_put(x, seg_sh) for x in batch[:5]] + [
        plan.shard_replicated(batch[5])
    ]
    sN, cN, oN = stepN(stateN, carryN, *batchN)

    np.testing.assert_allclose(np.asarray(o1.loss), np.asarray(oN.loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1["h"]), np.asarray(cN["h"]),
                               rtol=1e-3, atol=1e-3)
    # params agree after the K updates.  Adam divides by sqrt(v), which
    # amplifies tiny FP reduction-order differences between the sharded and
    # unsharded compilations — so the bound here is the adam step size
    # (lr=3e-4 per update, 2 updates), not ulp-level.
    p1 = jax.tree.leaves(s1.params)
    pN = jax.tree.leaves(sN.params)
    for a, b in zip(p1, pN):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-3)


def test_carry_rows_shard_with_batch(rng):
    """Carry-state rows live on the chip that owns their utterances."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    plan = make_mesh_plan(MeshConfig(data_parallel=8), jax.devices()[:8])
    carry = plan.shard_batch(init_carry(
        Config().model, 16
    ))
    sharding = carry["h"].sharding
    assert sharding.spec == P("data")
    # each device holds exactly B/8 rows
    shard_shapes = {s.data.shape for s in carry["h"].addressable_shards}
    assert shard_shapes == {(2,) + carry["h"].shape[1:]}


def test_training_loop_on_mesh(tmp_path, rng):
    """Full train() with data_parallel=8 over the virtual CPU mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from statecatcher_tpu.data.audio import write_wav_bytes
    from statecatcher_tpu.train.loop import train

    d = tmp_path / "data"
    d.mkdir(parents=True)
    sr = 8000
    for i in range(4):
        x = (rng.uniform(-0.3, 0.3, size=2 * sr)).astype(np.float32)
        (d / f"r{i}.wav").write_bytes(write_wav_bytes(x, sr))
        (d / f"r{i}.vtt").write_text(
            "WEBVTT\n\n00:00:00.000 --> 00:00:02.000\nhello mesh world\n"
        )
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "16",
        "--model.num_layers", "1",
        "--data.source", "local", "--data.local_dir", str(d),
        "--data.batch_samplerate", "8000", "--data.batch_size", "8",
        "--data.target_duration", "1.0", "--data.num_workers", "2",
        "--train.model_dir", str(tmp_path / "models"),
        "--train.steps", "3", "--train.log_every_n", "2",
        "--mesh.data_parallel", "8",
    ])
    summary = train(cfg)
    assert summary["global_step"] == 3
