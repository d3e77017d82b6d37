"""LucyRNN semantics tests.

The 7-gate cell is checked against an independent sequential numpy
re-statement of the reference Triton kernel math (reference
lucyrnn_triton.py:204-241), plus the stateful-carry invariance property:
running one segment of length 2T equals two segments of length T with
carried state (SURVEY.md §4c).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import LucyRNNConfig
from statecatcher_tpu.models.lucyrnn import LucyRNNEncoder, lucy_cell_parallel

EPS = 1e-6


def numpy_lucy_step(gates_t, h, s):
    """One timestep of the 7-gate cell, scalar-style numpy (independent impl)."""
    r, z, k, v, h_pre, decay, alpha = [gates_t[:, i, :] for i in range(7)]
    rms_control = np.sqrt((r * r + z * z) / 2 + EPS)
    rms_kv = np.sqrt((k * k + v * v) / 2 + EPS)
    rms_decay = np.sqrt(decay * decay + EPS)
    rms_alpha = np.sqrt(alpha * alpha + EPS)
    rms_h = np.sqrt(h_pre * h_pre + EPS)
    r = r / rms_control
    z = z / rms_control
    decay = decay / rms_decay
    k = k / rms_kv
    v = v / rms_kv
    h_pre = h_pre / rms_h
    alpha = alpha / rms_alpha

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    z = sig(z)
    decay = sig(decay)
    alpha = sig(alpha)
    kv = (k * v) / (rms_kv * rms_kv + EPS)
    s = decay * s + alpha * kv
    c = sig(2 * (h_pre + s)) * 2.0 - 1.0
    h = (1.0 - z) * c + z * h
    return h, s


def numpy_lucy_forward(gates, h0, s0):
    B, T, _, D = gates.shape
    h, s = h0.copy(), s0.copy()
    out = np.zeros((B, T, D), dtype=np.float64)
    for t in range(T):
        h, s = numpy_lucy_step(gates[:, t].astype(np.float64), h, s)
        out[:, t] = h
    return out, h, s


@pytest.mark.parametrize("impl", ["assoc", "xla-scan"])
def test_cell_matches_numpy_reference(impl, rng):
    B, T, D = 2, 23, 4
    gates = rng.standard_normal((B, T, 7, D)).astype(np.float32)
    h0 = rng.standard_normal((B, D)).astype(np.float32)
    s0 = rng.standard_normal((B, D)).astype(np.float32)
    h_all, h_T, s_T = lucy_cell_parallel(
        jnp.asarray(gates), jnp.asarray(h0), jnp.asarray(s0), impl=impl
    )
    want_out, want_h, want_s = numpy_lucy_forward(gates, h0, s0)
    np.testing.assert_allclose(np.asarray(h_all), want_out, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_T), want_h, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_T), want_s, rtol=2e-4, atol=2e-5)


def _make_encoder(B=2, T=16, F=8, D=6, L=2, tracks=1, **kw):
    cfg = LucyRNNConfig(hidden_dim=D, num_layers=L, num_tracks=tracks, **kw)
    enc = LucyRNNEncoder(input_dim=F, vocab_size=11, cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    params = enc.init(jax.random.PRNGKey(0), x)
    return enc, params, x


def test_encoder_shapes_and_state():
    B, T, F, D, L = 2, 16, 8, 6, 2
    enc, params, x = _make_encoder(B, T, F, D, L)
    logits, state = enc.apply(params, x)
    assert logits.shape == (B, T, 11)
    assert state["h"].shape == (B, 1, L, D)
    assert state["s"].shape == (B, 1, L, D)
    # zero-init output proj → logits must be exactly zero at init
    assert np.allclose(np.asarray(logits), 0.0)


def test_state_carry_invariance():
    """One pass over 2T frames == two chained passes over T frames each."""
    B, T, F, D, L = 2, 12, 8, 6, 2
    enc, params, _ = _make_encoder(B, 2 * T, F, D, L)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, 2 * T, F))

    full_logits, full_state = enc.apply(params, x)

    first, st1 = enc.apply(params, x[:, :T])
    second, st2 = enc.apply(params, x[:, T:], st1)

    np.testing.assert_allclose(
        np.asarray(full_logits[:, :T]), np.asarray(first), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(full_logits[:, T:]), np.asarray(second), rtol=1e-4, atol=1e-5
    )
    for k in ("h", "s"):
        np.testing.assert_allclose(
            np.asarray(full_state[k]), np.asarray(st2[k]), rtol=1e-4, atol=1e-5
        )


def test_multi_track():
    enc, params, x = _make_encoder(tracks=2)
    logits, state = enc.apply(params, x)
    assert state["h"].shape[1] == 2
    assert logits.shape[-1] == 11


def test_mask_freezes_state_when_enabled():
    B, T, F, D, L = 2, 10, 8, 6, 1
    cfg = LucyRNNConfig(hidden_dim=D, num_layers=L, mask_state_updates=True)
    enc = LucyRNNEncoder(input_dim=F, vocab_size=5, cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    params = enc.init(jax.random.PRNGKey(0), x)
    mask = jnp.ones((B, T), dtype=bool)
    mask = mask.at[1, 5:].set(False)  # second utterance ends at frame 5
    _, state_masked = enc.apply(params, x, None, mask)
    _, state_short = enc.apply(params, x[:, :5], None, jnp.ones((B, 5), bool))
    # for utterance 1, masked-out tail must not change the carried state
    np.testing.assert_allclose(
        np.asarray(state_masked["h"][1]), np.asarray(state_short["h"][1]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state_masked["s"][1]), np.asarray(state_short["s"][1]),
        rtol=1e-5, atol=1e-6,
    )


def test_gradients_flow_through_recurrence():
    """The reference Triton path has NO backward through the scan (SURVEY.md
    Appendix A.1); ours must. Check gate_proj of the FIRST layer receives a
    nonzero gradient through a 2-layer stack."""
    enc, params, x = _make_encoder(L=2)

    def loss(p):
        logits, _ = enc.apply(p, x)
        return jnp.sum(logits ** 2) + jnp.sum(
            enc.apply(p, x)[1]["s"] ** 2
        )

    g = jax.grad(loss)(params)
    g0 = np.asarray(g["params"]["track0_layer0"]["gate_proj"]["kernel"])
    assert np.abs(g0).max() > 0
