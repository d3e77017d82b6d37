import numpy as np
import pytest

import jax.numpy as jnp

from statecatcher_tpu.ops.scan import linear_scan_assoc, linear_scan_seq


def numpy_scan(a, b, s0):
    B, T, D = a.shape
    out = np.zeros_like(a)
    s = s0.copy()
    for t in range(T):
        s = a[:, t] * s + b[:, t]
        out[:, t] = s
    return out


@pytest.mark.parametrize("impl", [linear_scan_assoc, linear_scan_seq])
def test_linear_scan_matches_numpy(impl, rng):
    B, T, D = 3, 37, 5
    a = rng.uniform(0.0, 1.0, (B, T, D)).astype(np.float32)
    b = rng.standard_normal((B, T, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)
    got = np.asarray(impl(jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)))
    want = numpy_scan(a, b, s0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_assoc_equals_seq(rng):
    B, T, D = 2, 64, 8
    a = rng.uniform(0.2, 0.99, (B, T, D)).astype(np.float32)
    b = rng.standard_normal((B, T, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)
    x = np.asarray(linear_scan_assoc(jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)))
    y = np.asarray(linear_scan_seq(jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)))
    np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-5)


def test_scan_grad_matches_finite_difference(rng):
    import jax

    B, T, D = 1, 9, 3
    a = rng.uniform(0.3, 0.9, (B, T, D)).astype(np.float64)
    b = rng.standard_normal((B, T, D)).astype(np.float64)
    s0 = rng.standard_normal((B, D)).astype(np.float64)

    def loss_assoc(a_, b_, s0_):
        return jnp.sum(linear_scan_assoc(a_, b_, s0_) ** 2)

    def loss_seq(a_, b_, s0_):
        return jnp.sum(linear_scan_seq(a_, b_, s0_) ** 2)

    jax.config.update("jax_enable_x64", True)
    try:
        ga = jax.grad(loss_assoc, argnums=(0, 1, 2))(a, b, s0)
        gs = jax.grad(loss_seq, argnums=(0, 1, 2))(a, b, s0)
        for x, y in zip(ga, gs):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-9, atol=1e-9)
        # finite differences on a few coordinates
        eps = 1e-6
        f0 = float(loss_seq(a, b, s0))
        for (arr, g, idx) in [
            (a, gs[0], (0, 4, 1)),
            (b, gs[1], (0, 7, 2)),
            (s0, gs[2], (0, 0)),
        ]:
            pert = arr.copy()
            pert[idx] += eps
            f1 = float(loss_seq(pert if arr is a else a,
                                pert if arr is b else b,
                                pert if arr is s0 else s0))
            fd = (f1 - f0) / eps
            np.testing.assert_allclose(fd, float(np.asarray(g)[idx]), rtol=1e-3)
    finally:
        jax.config.update("jax_enable_x64", False)
