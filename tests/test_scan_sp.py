"""Sequence-parallel scan: time-sharded over 8 devices == single-device scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from statecatcher_tpu.ops.scan import linear_scan_seq
from statecatcher_tpu.ops.scan_sp import linear_scan_time_sharded


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("seq",))


def test_time_sharded_matches_seq(rng, mesh):
    B, T, D = 2, 64, 16
    a = rng.uniform(0.3, 1.0, (B, T, D)).astype(np.float32)
    b = rng.standard_normal((B, T, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)

    a_sh = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P(None, "seq")))
    b_sh = jax.device_put(jnp.asarray(b), NamedSharding(mesh, P(None, "seq")))
    s0_r = jax.device_put(jnp.asarray(s0), NamedSharding(mesh, P()))

    got = np.asarray(linear_scan_time_sharded(a_sh, b_sh, s0_r, mesh, "seq"))
    want = np.asarray(linear_scan_seq(jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_time_sharded_output_stays_sharded(rng, mesh):
    B, T, D = 2, 32, 8
    a = jax.device_put(
        jnp.asarray(rng.uniform(0.5, 1.0, (B, T, D)).astype(np.float32)),
        NamedSharding(mesh, P(None, "seq")),
    )
    b = jax.device_put(
        jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)),
        NamedSharding(mesh, P(None, "seq")),
    )
    s0 = jax.device_put(jnp.zeros((B, D), jnp.float32), NamedSharding(mesh, P()))
    out = linear_scan_time_sharded(a, b, s0, mesh, "seq")
    assert out.sharding.spec[1] == "seq"  # time axis still sharded


def test_time_sharded_grad(rng, mesh):
    B, T, D = 1, 32, 8
    a = rng.uniform(0.5, 0.95, (B, T, D)).astype(np.float32)
    b = rng.standard_normal((B, T, D)).astype(np.float32)
    s0 = np.zeros((B, D), np.float32)
    w = rng.standard_normal((B, T, D)).astype(np.float32)

    sh_t = NamedSharding(mesh, P(None, "seq"))
    sh_r = NamedSharding(mesh, P())

    def loss_sp(a_, b_, s0_):
        return jnp.sum(linear_scan_time_sharded(a_, b_, s0_, mesh, "seq") * w)

    def loss_ref(a_, b_, s0_):
        return jnp.sum(linear_scan_seq(a_, b_, s0_) * w)

    # NB: must be jitted — eager-mode shard_map transpose trips a sharding
    # assertion in jax 0.9 (production paths are always jitted).
    gs = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(
        jax.device_put(jnp.asarray(a), sh_t),
        jax.device_put(jnp.asarray(b), sh_t),
        jax.device_put(jnp.asarray(s0), sh_r),
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)
    )
    for x, y in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-3)
