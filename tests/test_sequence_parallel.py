"""Sequence/context parallelism wired end-to-end: LucyRNN with
kernel_impl="sp" runs its recurrence scans time-sharded over the mesh's
sequence axis (ops/scan_sp.py), and matches the unsharded encoder for
losses AND gradients (SURVEY.md §2.3 SP row; VERDICT round 1 item 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config, MeshConfig
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.ops.scan_sp import sequence_parallel_scans
from statecatcher_tpu.parallel.mesh import make_mesh_plan


def _model_cfg(impl):
    return Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "32",
        "--model.num_layers", "2", "--model.vocab_size", "16",
        "--model.lucyrnn.kernel_impl", impl,
    ])


def _plan():
    return make_mesh_plan(
        MeshConfig(data_parallel=4, model_parallel=2), jax.devices()[:8]
    )


def test_sp_encoder_matches_unsharded(rng):
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    B, T, F = 4, 22, 8        # T=22 not divisible by axis size 2: pad path
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    ref_model = build_model(_model_cfg("assoc").model, F)
    carry = init_carry(_model_cfg("assoc").model, B)
    params = ref_model.init(jax.random.PRNGKey(0), x, carry)

    def ref_loss(p):
        logits, st = ref_model.apply(p, x, carry)
        return jnp.sum(logits ** 2) + jnp.sum(st["s"] ** 2), (logits, st)

    (l_ref, (y_ref, st_ref)), g_ref = jax.value_and_grad(
        ref_loss, has_aux=True)(params)

    sp_model = build_model(_model_cfg("sp").model, F)
    plan = _plan()

    def sp_loss(p):
        logits, st = sp_model.apply(p, x, carry)
        return jnp.sum(logits ** 2) + jnp.sum(st["s"] ** 2), (logits, st)

    with sequence_parallel_scans(plan.mesh, "model"):
        (l_sp, (y_sp, st_sp)), g_sp = jax.jit(
            jax.value_and_grad(sp_loss, has_aux=True))(params)

    np.testing.assert_allclose(float(l_ref), float(l_sp), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sp),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_ref["s"]), np.asarray(st_sp["s"]),
                               rtol=1e-3, atol=1e-4)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    for a, b in zip(flat_ref, flat_sp):
        a, b = np.asarray(a), np.asarray(b)
        # norm-relative: near-zero elements of huge-magnitude grad tensors
        # carry fp reduction-order noise; the tensor as a whole must match
        scale = np.max(np.abs(a)) + 1e-6
        assert np.max(np.abs(a - b)) <= 2e-3 * scale, (
            np.max(np.abs(a - b)), scale)


def test_sp_requires_context():
    cfg = _model_cfg("sp")
    model = build_model(cfg.model, 8)
    x = jnp.zeros((2, 8, 8), jnp.float32)
    with pytest.raises(RuntimeError, match="sequence_parallel_scans"):
        model.init(jax.random.PRNGKey(0), x)


def test_sp_train_step_matches_unsharded(rng):
    """Full segment-scan train step with kernel_impl="sp" on a 4×2 mesh:
    the step builder activates the SP context itself (no manual wrapping)."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from statecatcher_tpu.train.step import init_train_state, make_segment_scan_step

    over = [
        "--model.hidden_size", "32", "--model.num_layers", "1",
        "--model.vocab_size", "32", "--data.batch_size", "8",
        "--data.target_duration", "0.5", "--data.batch_samplerate", "8000",
    ]
    cfg_ref = _model_cfg("assoc").apply_overrides(over)
    cfg_sp = _model_cfg("sp").apply_overrides(over)

    B, K, S, U = 8, 2, 4000, 16
    batch = (
        jnp.asarray(rng.uniform(-0.3, 0.3, (K, B, S)).astype(np.float32)),
        jnp.ones((K, B, S), jnp.bool_),
        jnp.asarray(rng.integers(1, 32, (K, B, U)).astype(np.int32)),
        jnp.full((K, B), 5, jnp.int32),
        jnp.ones((K, B), jnp.bool_),
        jnp.ones((K,), jnp.bool_),
    )

    model_ref = build_model(cfg_ref.model, 80)
    state = init_train_state(model_ref, cfg_ref, jax.random.PRNGKey(0), 80, 16)
    step_ref = make_segment_scan_step(model_ref, cfg_ref)
    _, _, o_ref = step_ref(state, init_carry(cfg_ref.model, B), *batch)

    plan = _plan()
    model_sp = build_model(cfg_sp.model, 80)
    state2 = init_train_state(model_ref, cfg_ref, jax.random.PRNGKey(0), 80, 16)
    state2 = plan.shard_replicated(state2)
    step_sp = make_segment_scan_step(model_sp, cfg_sp, mesh_plan=plan)
    _, _, o_sp = step_sp(state2, init_carry(cfg_sp.model, B), *batch)

    np.testing.assert_allclose(np.asarray(o_ref.loss), np.asarray(o_sp.loss),
                               rtol=1e-4, atol=1e-5)
