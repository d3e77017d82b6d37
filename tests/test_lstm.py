"""LSTM encoder tests — golden comparison against torch.nn.LSTM (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.models.lstm import LSTMEncoder


def _torch_lstm_outputs(x, params, num_layers, H):
    torch = pytest.importorskip("torch")
    B, T, F = x.shape
    lstm = torch.nn.LSTM(input_size=F, hidden_size=H, num_layers=num_layers,
                         batch_first=True)
    sd = {}
    for l in range(num_layers):
        p = params["params"][f"layer{l}"]
        sd[f"weight_ih_l{l}"] = torch.from_numpy(np.asarray(p["w_ih"]).T.copy())
        sd[f"weight_hh_l{l}"] = torch.from_numpy(np.asarray(p["w_hh"]).T.copy())
        sd[f"bias_ih_l{l}"] = torch.from_numpy(np.asarray(p["b_ih"]).copy())
        sd[f"bias_hh_l{l}"] = torch.from_numpy(np.asarray(p["b_hh"]).copy())
    lstm.load_state_dict(sd)
    with torch.no_grad():
        y, (h, c) = lstm(torch.from_numpy(x))
    return y.numpy(), h.numpy(), c.numpy()


def test_lstm_matches_torch(rng):
    B, T, F, H, L = 2, 11, 5, 7, 2
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    enc = LSTMEncoder(input_dim=F, hidden_size=H, num_layers=L)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, state = enc.apply(params, jnp.asarray(x))
    ty, th, tc = _torch_lstm_outputs(x, params, L, H)
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-5)
    # torch h: (L, B, H) → ours (B, L, H)
    np.testing.assert_allclose(
        np.asarray(state["h"]), np.transpose(th, (1, 0, 2)), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state["c"]), np.transpose(tc, (1, 0, 2)), rtol=1e-4, atol=1e-5
    )


def test_lstm_state_carry_invariance(rng):
    B, T, F, H, L = 2, 16, 5, 7, 2
    x = rng.standard_normal((B, 2 * T, F)).astype(np.float32)
    enc = LSTMEncoder(input_dim=F, hidden_size=H, num_layers=L)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_full, st_full = enc.apply(params, jnp.asarray(x))
    y1, st1 = enc.apply(params, jnp.asarray(x[:, :T]))
    y2, st2 = enc.apply(params, jnp.asarray(x[:, T:]), st1)
    np.testing.assert_allclose(np.asarray(y_full[:, T:]), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)
    for k in ("h", "c"):
        np.testing.assert_allclose(np.asarray(st_full[k]), np.asarray(st2[k]),
                                   rtol=1e-4, atol=1e-5)


def test_lstm_packed_mask_semantics(rng):
    """Masked (padded) frames freeze state and zero the output — cuDNN
    packed-sequence parity (reference model.py:350-372)."""
    B, T, F, H = 2, 10, 4, 6
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    enc = LSTMEncoder(input_dim=F, hidden_size=H, num_layers=1)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mask = np.ones((B, T), dtype=bool)
    mask[1, 6:] = False
    y, st = enc.apply(params, jnp.asarray(x), None, jnp.asarray(mask))
    # output zero at padded frames
    assert np.allclose(np.asarray(y)[1, 6:], 0.0)
    # final state equals state after 6 frames
    y_short, st_short = enc.apply(params, jnp.asarray(x[1:2, :6]))
    np.testing.assert_allclose(np.asarray(st["h"])[1], np.asarray(st_short["h"])[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st["c"])[1], np.asarray(st_short["c"])[0],
                               rtol=1e-4, atol=1e-5)
