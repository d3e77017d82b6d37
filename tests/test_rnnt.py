"""RNN-T loss tests against an independent brute-force numpy lattice DP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.ops.rnnt import (
    rnnt_loss,
    rnnt_loss_fused,
    rnnt_loss_per_example,
)


def numpy_rnnt_nll(log_probs, labels, T, U, blank):
    """Straightforward O(T·U) double-loop DP (independent implementation)."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            cands = []
            if t == 0 and u == 0:
                continue
            if t > 0:
                cands.append(alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[T - 1, U] + log_probs[T - 1, U, blank])


def _rand_problem(rng, B=3, T=8, U=4, V=6):
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    t_lens = rng.integers(2, T + 1, size=(B,)).astype(np.int32)
    u_lens = rng.integers(0, U + 1, size=(B,)).astype(np.int32)
    return logits, labels, t_lens, u_lens


def test_rnnt_matches_numpy_dp(rng):
    logits, labels, t_lens, u_lens = _rand_problem(rng)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    got = np.asarray(
        rnnt_loss_per_example(
            jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(t_lens),
            jnp.asarray(u_lens),
        )
    )
    for b in range(logits.shape[0]):
        want = numpy_rnnt_nll(lp[b], labels[b], int(t_lens[b]), int(u_lens[b]), 0)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_rnnt_mean_and_row_valid(rng):
    logits, labels, t_lens, u_lens = _rand_problem(rng, B=4)
    full = float(
        rnnt_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_lens),
                  jnp.asarray(u_lens))
    )
    per = np.asarray(
        rnnt_loss_per_example(
            jax.nn.log_softmax(jnp.asarray(logits), -1), jnp.asarray(labels),
            jnp.asarray(t_lens), jnp.asarray(u_lens),
        )
    )
    np.testing.assert_allclose(full, per.mean(), rtol=1e-5)
    rv = jnp.asarray([True, True, False, False])
    masked = float(
        rnnt_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_lens),
                  jnp.asarray(u_lens), row_valid=rv)
    )
    np.testing.assert_allclose(masked, per[:2].mean(), rtol=1e-5)


def test_rnnt_gradients_finite(rng):
    logits, labels, t_lens, u_lens = _rand_problem(rng, B=2)

    def loss(lg):
        return rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_lens),
                         jnp.asarray(u_lens))

    g = np.asarray(jax.grad(loss)(jnp.asarray(logits)))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_fused_matches_dense(rng):
    B, T, U, J, V = 2, 10, 4, 8, 6
    enc_proj = rng.standard_normal((B, T, J)).astype(np.float32)
    pred_proj = rng.standard_normal((B, U + 1, J)).astype(np.float32)
    W = rng.standard_normal((J, V)).astype(np.float32) * 0.3
    bias = rng.standard_normal((V,)).astype(np.float32) * 0.1
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    t_lens = np.array([10, 7], dtype=np.int32)
    u_lens = np.array([4, 2], dtype=np.int32)

    joint = np.tanh(enc_proj[:, :, None, :] + pred_proj[:, None, :, :])
    logits = joint @ W + bias

    dense = float(
        rnnt_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_lens),
                  jnp.asarray(u_lens))
    )
    fused = float(
        rnnt_loss_fused(
            jnp.asarray(enc_proj), jnp.asarray(pred_proj), jnp.asarray(W),
            jnp.asarray(bias), jnp.asarray(labels), jnp.asarray(t_lens),
            jnp.asarray(u_lens), time_chunk=4,
        )
    )
    np.testing.assert_allclose(fused, dense, rtol=1e-4, atol=1e-5)


def test_fused_gradients_match_dense(rng):
    B, T, U, J, V = 2, 8, 3, 6, 5
    enc_proj = rng.standard_normal((B, T, J)).astype(np.float32)
    pred_proj = rng.standard_normal((B, U + 1, J)).astype(np.float32)
    W = (rng.standard_normal((J, V)) * 0.3).astype(np.float32)
    bias = np.zeros((V,), np.float32)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    t_lens = np.array([8, 5], dtype=np.int32)
    u_lens = np.array([3, 2], dtype=np.int32)

    def dense_loss(e, p, w):
        joint = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
        logits = joint @ w + bias
        return rnnt_loss(logits, jnp.asarray(labels), jnp.asarray(t_lens),
                         jnp.asarray(u_lens))

    def fused_loss(e, p, w):
        return rnnt_loss_fused(e, p, w, jnp.asarray(bias), jnp.asarray(labels),
                               jnp.asarray(t_lens), jnp.asarray(u_lens),
                               time_chunk=4)

    gd = jax.grad(dense_loss, argnums=(0, 1, 2))(
        jnp.asarray(enc_proj), jnp.asarray(pred_proj), jnp.asarray(W)
    )
    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(
        jnp.asarray(enc_proj), jnp.asarray(pred_proj), jnp.asarray(W)
    )
    for a, b in zip(gd, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_predictor_joiner_module(rng):
    from statecatcher_tpu.models.rnnt import RNNTPredictorJoiner, make_prefix

    B, T, U, V = 2, 6, 3, 10
    enc_out = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)).astype(np.int32))
    prefix = make_prefix(labels, 0)
    assert prefix.shape == (B, U + 1)
    assert np.all(np.asarray(prefix)[:, 0] == 0)

    pj = RNNTPredictorJoiner(vocab_size=V, enc_out_dim=V, pred_emb_dim=8, join_dim=8)
    variables = pj.init(jax.random.PRNGKey(0), enc_out, prefix)
    logits = pj.apply(variables, enc_out, prefix)
    assert logits.shape == (B, T, U + 1, V)

    # fused pieces consistent with dense joint
    enc_p, pred_p, W, bias = pj.apply(variables, enc_out, prefix, method=pj.project)
    joint = np.tanh(np.asarray(enc_p)[:, :, None, :] + np.asarray(pred_p)[:, None, :, :])
    manual = joint @ np.asarray(W) + np.asarray(bias)
    np.testing.assert_allclose(manual, np.asarray(logits), rtol=1e-4, atol=1e-5)
