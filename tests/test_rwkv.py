"""RWKV tests: WKV recurrence vs a naive numpy step loop, carry invariance,
encoder end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.models.rwkv import RWKVEncoder, wkv_parallel

NEG = -1e30


def numpy_wkv(k, v, w, u):
    """Straightforward per-step reference (un-stabilized, float64)."""
    B, T, D = k.shape
    out = np.zeros((B, T, D))
    num = np.zeros((B, D))
    den = np.zeros((B, D))
    for t in range(T):
        ek_u = np.exp(u[None, :] + k[:, t])
        out[:, t] = (num + ek_u * v[:, t]) / (den + ek_u)
        decay = np.exp(-w)[None, :]
        num = decay * num + np.exp(k[:, t]) * v[:, t]
        den = decay * den + np.exp(k[:, t])
    return out, num, den


def _zero_state(B, D):
    z = jnp.full((B, D), NEG, jnp.float32)
    return (z, z, z)


def test_wkv_matches_numpy(rng):
    B, T, D = 2, 20, 8
    k = rng.standard_normal((B, T, D)).astype(np.float32)
    v = rng.standard_normal((B, T, D)).astype(np.float32)
    w = np.abs(rng.standard_normal(D)).astype(np.float32) + 0.1
    u = rng.standard_normal(D).astype(np.float32) * 0.5
    got, st = wkv_parallel(jnp.asarray(k), jnp.asarray(v), jnp.asarray(w),
                           jnp.asarray(u), _zero_state(B, D))
    want, num, den = numpy_wkv(k.astype(np.float64), v.astype(np.float64),
                               w.astype(np.float64), u.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    # final state consistency: exp(log_num_p) − exp(log_num_n) == num
    log_p, log_n, log_d = st
    np.testing.assert_allclose(
        np.exp(np.asarray(log_p)) - np.exp(np.asarray(log_n)), num,
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(np.exp(np.asarray(log_d)), den, rtol=1e-3, atol=1e-4)


def test_wkv_carry_invariance(rng):
    B, T, D = 2, 16, 6
    k = rng.standard_normal((B, T, D)).astype(np.float32)
    v = rng.standard_normal((B, T, D)).astype(np.float32)
    w = np.abs(rng.standard_normal(D)).astype(np.float32) + 0.2
    u = rng.standard_normal(D).astype(np.float32) * 0.3
    full, _ = wkv_parallel(jnp.asarray(k), jnp.asarray(v), jnp.asarray(w),
                           jnp.asarray(u), _zero_state(B, D))
    o1, st = wkv_parallel(jnp.asarray(k[:, :8]), jnp.asarray(v[:, :8]),
                          jnp.asarray(w), jnp.asarray(u), _zero_state(B, D))
    o2, _ = wkv_parallel(jnp.asarray(k[:, 8:]), jnp.asarray(v[:, 8:]),
                         jnp.asarray(w), jnp.asarray(u), st)
    np.testing.assert_allclose(np.asarray(full[:, 8:]), np.asarray(o2),
                               rtol=1e-3, atol=1e-4)


def test_rwkv_encoder_shapes_and_carry(rng):
    enc = RWKVEncoder(input_dim=10, vocab_size=13, dim=16, num_layers=2)
    x = jnp.asarray(rng.standard_normal((2, 12, 10)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    logits, state = enc.apply(params, x)
    assert logits.shape == (2, 12, 13)
    assert np.allclose(np.asarray(logits), 0.0)  # zero-init head

    y_full, st_full = enc.apply(params, x)
    y1, st1 = enc.apply(params, x[:, :6])
    y2, st2 = enc.apply(params, x[:, 6:], st1)
    np.testing.assert_allclose(np.asarray(y_full[:, 6:]), np.asarray(y2),
                               rtol=1e-3, atol=1e-4)
    for key in st_full:
        a = np.asarray(st_full[key])
        b = np.asarray(st2[key])
        finite = np.isfinite(a) & (a > NEG / 2)
        np.testing.assert_allclose(a[finite], b[finite], rtol=1e-3, atol=1e-3)


def test_rwkv_gradients_flow(rng):
    enc = RWKVEncoder(input_dim=8, vocab_size=9, dim=12, num_layers=1)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.full_like(v, 0.01)
        if any(getattr(p, "key", None) == "vocab_proj" for p in path)
        and v.ndim == 2 else v,
        params,
    )

    def loss(p):
        logits, _ = enc.apply(p, x)
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(params)
    gk = np.asarray(g["params"]["time_mix0"]["key"]["kernel"])
    assert np.isfinite(gk).all() and np.abs(gk).max() > 0
