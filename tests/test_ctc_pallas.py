"""Pallas CTC kernel vs the XLA lattice implementation (itself torch-golden).

Interpret mode on CPU; compiled on a real chip with STATECATCHER_TEST_TPU=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from statecatcher_tpu.ops.ctc import ctc_nll_lattice


def _run(fn, *args):
    if os.environ.get("STATECATCHER_TEST_TPU") == "1":
        return fn(*args)
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


def _problem(rng, B=3, T=20, U=6, V=12):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    in_lens = rng.integers(U + 2, T + 1, size=(B,)).astype(np.int32)
    label_lens = rng.integers(1, U + 1, size=(B,)).astype(np.int32)
    return lp, labels, in_lens, label_lens


def test_pallas_ctc_nll_matches_lattice(rng):
    from statecatcher_tpu.ops.ctc_pallas import ctc_nll_pallas

    lp, labels, in_lens, label_lens = _problem(rng)
    got = np.asarray(_run(
        ctc_nll_pallas, jnp.asarray(lp), jnp.asarray(in_lens),
        jnp.asarray(labels), jnp.asarray(label_lens),
    ))
    want = np.asarray(ctc_nll_lattice(
        jnp.asarray(lp), jnp.asarray(in_lens), jnp.asarray(labels),
        jnp.asarray(label_lens),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_ctc_repeats_and_zero_len(rng):
    from statecatcher_tpu.ops.ctc_pallas import ctc_nll_pallas

    V = 8
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((2, 14, V)).astype(np.float32)), -1))
    labels = np.array([[2, 2, 3, 3], [0, 0, 0, 0]], np.int32)
    in_lens = np.array([14, 10], np.int32)
    label_lens = np.array([4, 0], np.int32)
    got = np.asarray(_run(
        ctc_nll_pallas, jnp.asarray(lp), jnp.asarray(in_lens),
        jnp.asarray(labels), jnp.asarray(label_lens),
    ))
    want = np.asarray(ctc_nll_lattice(
        jnp.asarray(lp), jnp.asarray(in_lens), jnp.asarray(labels),
        jnp.asarray(label_lens),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_ctc_grad_matches_lattice(rng):
    from statecatcher_tpu.ops.ctc_pallas import ctc_nll_pallas

    lp, labels, in_lens, label_lens = _problem(rng, B=2, T=15, U=4, V=8)

    def loss_p(lp_):
        return jnp.sum(ctc_nll_pallas(
            lp_, jnp.asarray(in_lens), jnp.asarray(labels), jnp.asarray(label_lens)
        ))

    def loss_l(lp_):
        return jnp.sum(ctc_nll_lattice(
            lp_, jnp.asarray(in_lens), jnp.asarray(labels), jnp.asarray(label_lens)
        ))

    gp = np.asarray(_run(jax.grad(loss_p), jnp.asarray(lp)))
    gl = np.asarray(jax.grad(loss_l)(jnp.asarray(lp)))
    # On a real chip the occupancy-posterior path (exp/log transcendentals in
    # the beta kernel) differs from the XLA lattice at the ~2e-3 level.
    np.testing.assert_allclose(gp, gl, rtol=5e-3, atol=2e-3)


def test_pallas_ctc_through_loss_wrapper(rng):
    """impl='pallas' path of ops.ctc.ctc_loss incl. torch-parity reduction."""
    from statecatcher_tpu.ops.ctc import ctc_loss

    lp, labels, in_lens, label_lens = _problem(rng)
    logits = jnp.asarray(lp)  # already log-probs; log_softmax is idempotent-ish
    got = float(_run(
        lambda *a: ctc_loss(*a, impl="pallas"),
        logits, jnp.asarray(in_lens), jnp.asarray(labels), jnp.asarray(label_lens),
    ))
    want = float(ctc_loss(
        logits, jnp.asarray(in_lens), jnp.asarray(labels), jnp.asarray(label_lens),
        impl="lattice",
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
