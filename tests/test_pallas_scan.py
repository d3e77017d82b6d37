"""Pallas linear-scan kernel tests.

Run in Pallas interpret mode on CPU (SURVEY.md §5 race detection: interpret
mode for kernel tests); the same tests run compiled on a real chip with
STATECATCHER_TEST_TPU=1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from statecatcher_tpu.ops.scan import linear_scan_seq


def _pallas_scan(a, b, s0):
    from statecatcher_tpu.ops.lucy_pallas import linear_scan_pallas

    return linear_scan_pallas(a, b, s0)


def _run(fn, *args):
    import os

    if os.environ.get("STATECATCHER_TEST_TPU") == "1":
        return fn(*args)
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("shape", [(2, 16, 128), (1, 300, 128), (2, 64, 200)])
def test_pallas_scan_matches_seq(rng, shape):
    B, T, D = shape
    a = rng.uniform(0.2, 1.0, (B, T, D)).astype(np.float32)
    b = rng.standard_normal((B, T, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)
    got = np.asarray(_run(_pallas_scan, jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)))
    want = np.asarray(linear_scan_seq(jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_scan_grad_matches_seq(rng):
    B, T, D = 2, 48, 128
    a = rng.uniform(0.3, 0.95, (B, T, D)).astype(np.float32)
    b = rng.standard_normal((B, T, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)
    w = rng.standard_normal((B, T, D)).astype(np.float32)

    def loss_p(a_, b_, s0_):
        return jnp.sum(_pallas_scan(a_, b_, s0_) * w)

    def loss_s(a_, b_, s0_):
        return jnp.sum(linear_scan_seq(a_, b_, s0_) * w)

    gp = _run(jax.grad(loss_p, argnums=(0, 1, 2)), jnp.asarray(a), jnp.asarray(b),
              jnp.asarray(s0))
    gs = jax.grad(loss_s, argnums=(0, 1, 2))(jnp.asarray(a), jnp.asarray(b),
                                             jnp.asarray(s0))
    for x, y in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-3)


def test_pallas_scan_bf16_inputs(rng):
    B, T, D = 2, 32, 128
    a = rng.uniform(0.5, 1.0, (B, T, D)).astype(np.float32)
    b = rng.standard_normal((B, T, D)).astype(np.float32)
    s0 = np.zeros((B, D), np.float32)
    got = np.asarray(
        _run(_pallas_scan, jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
             jnp.asarray(s0, jnp.bfloat16))
    ).astype(np.float32)
    want = np.asarray(linear_scan_seq(jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
