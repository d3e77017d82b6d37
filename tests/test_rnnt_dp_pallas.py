"""Pallas RNN-T lattice DP (α/β scans + occupancy grads) vs the XLA DP
(itself brute-force-verified in test_rnnt.py).

Interpret mode on CPU; compiled on a real chip with STATECATCHER_TEST_TPU=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from statecatcher_tpu.ops.rnnt import rnnt_nll_from_blank_emit
from statecatcher_tpu.ops.rnnt_dp_pallas import rnnt_nll_dp_pallas

_ON_CHIP = os.environ.get("STATECATCHER_TEST_TPU") == "1"
_RTOL = 5e-3 if _ON_CHIP else 1e-5


def _run(fn, *args):
    if _ON_CHIP:
        return fn(*args)
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


def _problem(rng, B=4, T=37, U=13):
    U1 = U + 1
    blank = jnp.asarray(rng.standard_normal((B, T, U1)) - 1.5, jnp.float32)
    emit = jnp.asarray(rng.standard_normal((B, T, U)) - 1.5, jnp.float32)
    t_lens = jnp.asarray(rng.integers(U + 2, T + 1, (B,)), jnp.int32)
    u_lens = jnp.asarray(rng.integers(0, U + 1, (B,)), jnp.int32)
    return blank, emit, t_lens, u_lens


def test_nll_matches_xla_dp(rng):
    blank, emit, t_lens, u_lens = _problem(rng)
    want = rnnt_nll_from_blank_emit(blank, emit, t_lens, u_lens)
    got = _run(rnnt_nll_dp_pallas, blank, emit, t_lens, u_lens)
    np.testing.assert_allclose(got, want, rtol=_RTOL)


def test_grads_match_xla_autodiff(rng):
    blank, emit, t_lens, u_lens = _problem(rng)
    w = jnp.asarray(rng.uniform(0.5, 2.0, blank.shape[0]), jnp.float32)

    def ref(b, e):
        return jnp.sum(rnnt_nll_from_blank_emit(b, e, t_lens, u_lens) * w)

    def pal(b, e):
        return jnp.sum(rnnt_nll_dp_pallas(b, e, t_lens, u_lens) * w)

    l1, g1 = jax.value_and_grad(ref, argnums=(0, 1))(blank, emit)
    l2, g2 = _run(jax.value_and_grad(pal, argnums=(0, 1)), blank, emit)
    np.testing.assert_allclose(float(l2), float(l1), rtol=_RTOL)
    for name, a, c in zip(("g_blank", "g_emit"), g1, g2):
        np.testing.assert_allclose(
            c, a, rtol=max(_RTOL, 1e-4), atol=max(_RTOL * 1e-2, 1e-6),
            err_msg=name,
        )


def test_occupancy_invariant(rng):
    # Each lattice path consumes exactly one blank per active frame, so the
    # blank-edge occupancies must sum to 1 over u for every t < t_lens.
    blank, emit, t_lens, u_lens = _problem(rng, B=3, T=21, U=9)

    def pal(b):
        return jnp.sum(rnnt_nll_dp_pallas(b, emit, t_lens, u_lens))

    g = _run(jax.grad(pal), blank)
    occ = -np.asarray(g)
    for b in range(3):
        tl = int(t_lens[b])
        np.testing.assert_allclose(occ[b, :tl].sum(axis=1), 1.0, atol=5e-4)
        np.testing.assert_allclose(occ[b, tl:], 0.0, atol=1e-7)


def test_long_sequence_chunking(rng):
    # T beyond one kernel time-chunk exercises the carried scratch rows.
    blank, emit, t_lens, u_lens = _problem(rng, B=2, T=300, U=7)
    want = rnnt_nll_from_blank_emit(blank, emit, t_lens, u_lens)
    got = _run(rnnt_nll_dp_pallas, blank, emit, t_lens, u_lens)
    np.testing.assert_allclose(got, want, rtol=max(_RTOL, 1e-4))
