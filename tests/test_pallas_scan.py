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


def test_pallas_scan_grad_ragged_tail(rng):
    """T > chunk and T % chunk != 0: the ragged tail chunk is masked
    in-kernel (no padded input copy) in BOTH the forward and the
    reverse-adjoint kernels."""
    B, T, D = 1, 300, 128
    a = rng.uniform(0.3, 0.95, (B, T, D)).astype(np.float32)
    b = rng.standard_normal((B, T, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)
    w = rng.standard_normal((B, T, D)).astype(np.float32)

    def loss(scan):
        return lambda a_, b_, s0_: jnp.sum(scan(a_, b_, s0_) * w)

    gp = _run(jax.grad(loss(_pallas_scan), argnums=(0, 1, 2)),
              jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0))
    gs = jax.grad(loss(linear_scan_seq), argnums=(0, 1, 2))(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0))
    for x, y in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-3)


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


@pytest.mark.parametrize("impl", ["pallas-fused", "pallas-dual"])
@pytest.mark.parametrize("T", [40, 300])  # 300 > chunk: ragged tail path
def test_fused_cell_matches_unfused(rng, impl, T):
    from statecatcher_tpu.models.lucyrnn import lucy_cell_parallel

    B, D = 2, 128
    gates = rng.standard_normal((B, T, 7, D)).astype(np.float32)
    h0 = rng.standard_normal((B, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)

    def fused(g, h, s):
        return lucy_cell_parallel(g, h, s, impl=impl)

    got = _run(fused, jnp.asarray(gates), jnp.asarray(h0), jnp.asarray(s0))
    want = lucy_cell_parallel(jnp.asarray(gates), jnp.asarray(h0),
                              jnp.asarray(s0), impl="assoc")
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("impl", ["pallas-fused", "pallas-dual"])
def test_fused_cell_masked_matches_unfused(rng, impl):
    from statecatcher_tpu.models.lucyrnn import lucy_cell_parallel

    B, T, D = 2, 24, 128
    gates = rng.standard_normal((B, T, 7, D)).astype(np.float32)
    h0 = np.zeros((B, D), np.float32)
    s0 = np.zeros((B, D), np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 10:] = False

    def fused(g, h, s):
        return lucy_cell_parallel(g, h, s, impl=impl,
                                  frame_mask=jnp.asarray(mask))

    got = _run(fused, jnp.asarray(gates), jnp.asarray(h0), jnp.asarray(s0))
    want = lucy_cell_parallel(jnp.asarray(gates), jnp.asarray(h0),
                              jnp.asarray(s0), impl="assoc",
                              frame_mask=jnp.asarray(mask))
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("impl", ["pallas-fused", "pallas-dual"])
def test_fused_cell_grad_matches_unfused(rng, impl):
    from statecatcher_tpu.models.lucyrnn import lucy_cell_parallel

    B, T, D = 2, 24, 128
    gates = rng.standard_normal((B, T, 7, D)).astype(np.float32)
    h0 = rng.standard_normal((B, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)
    w = rng.standard_normal((B, T, D)).astype(np.float32)

    def loss(impl):
        def f(g, h, s):
            h_all, h_T, s_T = lucy_cell_parallel(g, h, s, impl=impl)
            return (jnp.sum(h_all * w) + jnp.sum(h_T) + 0.5 * jnp.sum(s_T))
        return f

    gp = _run(jax.grad(loss(impl), argnums=(0, 1, 2)),
              jnp.asarray(gates), jnp.asarray(h0), jnp.asarray(s0))
    ga = jax.grad(loss("assoc"), argnums=(0, 1, 2))(
        jnp.asarray(gates), jnp.asarray(h0), jnp.asarray(s0))
    for a, b in zip(gp, ga):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
