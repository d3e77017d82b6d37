"""Fused Pallas RNN-T joint kernel vs the XLA fused path (itself
brute-force-verified in test_rnnt.py).

Interpret mode on CPU; compiled on a real chip with STATECATCHER_TEST_TPU=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from statecatcher_tpu.ops.rnnt import (
    blank_emit_from_log_probs,
    rnnt_loss_fused,
)
from statecatcher_tpu.ops.rnnt_pallas import joint_blank_emit, rnnt_loss_pallas


_ON_CHIP = os.environ.get("STATECATCHER_TEST_TPU") == "1"
# On-chip transcendentals (tanh/exp/log) carry ~1e-3 relative error (same
# allowance as the TPU CTC grad test); interpret mode is bit-accurate XLA.
_RTOL = 5e-3 if _ON_CHIP else 1e-5
_ATOL = 5e-3 if _ON_CHIP else 1e-5


def _run(fn, *args):
    if _ON_CHIP:
        return fn(*args)
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


def _problem(rng, B=3, T=23, U=11, J=40, V=150):
    U1 = U + 1
    enc = jnp.asarray(rng.standard_normal((B, T, J)), jnp.float32)
    pred = jnp.asarray(rng.standard_normal((B, U1, J)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((J, V)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((V,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.asarray(rng.integers(U + 2, T + 1, (B,)), jnp.int32)
    u_lens = jnp.asarray(rng.integers(1, U + 1, (B,)), jnp.int32)
    return enc, pred, k, b, labels, t_lens, u_lens


def _xla_blank_emit(enc, pred, k, b, labels, blank_id=0):
    joint = jnp.tanh(enc[:, :, None, :] + pred[:, None, :, :])
    logits = (joint @ k + b).astype(jnp.float32)
    lp = jax.nn.log_softmax(logits, axis=-1)
    return blank_emit_from_log_probs(lp, labels, blank_id)


def test_joint_blank_emit_matches_xla(rng):
    enc, pred, k, b, labels, _, _ = _problem(rng)
    want_blank, want_emit = _xla_blank_emit(enc, pred, k, b, labels)
    got_blank, got_emit = _run(joint_blank_emit, enc, pred, k, b, labels)
    np.testing.assert_allclose(got_blank, want_blank, rtol=_RTOL, atol=_ATOL)
    np.testing.assert_allclose(got_emit, want_emit, rtol=_RTOL, atol=_ATOL)


def test_loss_and_grads_match_xla_fused(rng):
    enc, pred, k, b, labels, t_lens, u_lens = _problem(rng)

    def xla(enc, pred, k, b):
        return rnnt_loss_fused(enc, pred, k, b, labels, t_lens, u_lens)

    def pal(enc, pred, k, b):
        return rnnt_loss_pallas(enc, pred, k, b, labels, t_lens, u_lens)

    l_ref, g_ref = jax.value_and_grad(xla, argnums=(0, 1, 2, 3))(enc, pred, k, b)
    l_pal, g_pal = _run(
        jax.value_and_grad(pal, argnums=(0, 1, 2, 3)), enc, pred, k, b
    )
    np.testing.assert_allclose(l_pal, l_ref, rtol=_RTOL)
    for name, a, c in zip(("denc", "dpred", "dk", "db"), g_ref, g_pal):
        np.testing.assert_allclose(c, a, rtol=max(_RTOL, 2e-4), atol=max(_ATOL, 2e-5), err_msg=name)


def test_row_valid_masking(rng):
    enc, pred, k, b, labels, t_lens, u_lens = _problem(rng)
    row_valid = jnp.asarray([True, False, True])

    def pal(enc):
        return rnnt_loss_pallas(
            enc, pred, k, b, labels, t_lens, u_lens, row_valid=row_valid
        )

    loss, g = _run(jax.value_and_grad(pal), enc)
    # Invalid rows contribute no loss and no encoder gradient.
    np.testing.assert_allclose(np.asarray(g)[1], 0.0, atol=1e-7)
    blank, emit = _xla_blank_emit(enc, pred, k, b, labels)
    from statecatcher_tpu.ops.rnnt import rnnt_nll_from_blank_emit

    per = rnnt_nll_from_blank_emit(blank, emit, t_lens, u_lens)
    want = (per[0] + per[2]) / 2.0
    np.testing.assert_allclose(loss, want, rtol=_RTOL)


def test_bf16_inputs_close_to_f32(rng):
    enc, pred, k, b, labels, t_lens, u_lens = _problem(rng, B=2, T=17, U=7)

    def loss(enc, pred):
        return rnnt_loss_pallas(enc, pred, k, b, labels, t_lens, u_lens)

    l32 = _run(loss, enc, pred)
    l16 = _run(loss, enc.astype(jnp.bfloat16), pred.astype(jnp.bfloat16))
    np.testing.assert_allclose(float(l16), float(l32), rtol=3e-2)


def test_blank_id_nonzero(rng):
    enc, pred, k, b, labels, t_lens, u_lens = _problem(rng, V=50)
    blank_id = 7
    labels = jnp.where(labels == blank_id, blank_id + 1, labels)
    want_blank, want_emit = _xla_blank_emit(enc, pred, k, b, labels, blank_id)
    got_blank, got_emit = _run(
        lambda *a: joint_blank_emit(*a, blank_id=blank_id),
        enc, pred, k, b, labels,
    )
    np.testing.assert_allclose(got_blank, want_blank, rtol=_RTOL, atol=_ATOL)
    np.testing.assert_allclose(got_emit, want_emit, rtol=_RTOL, atol=_ATOL)


def test_time_block_invariance(rng):
    enc, pred, k, b, labels, t_lens, u_lens = _problem(rng, T=24)
    l8 = _run(lambda *a: rnnt_loss_pallas(*a, time_block=8),
              enc, pred, k, b, labels, t_lens, u_lens)
    l16 = _run(lambda *a: rnnt_loss_pallas(*a, time_block=16),
               enc, pred, k, b, labels, t_lens, u_lens)
    np.testing.assert_allclose(float(l8), float(l16), rtol=_RTOL if _ON_CHIP else 1e-6)
