"""xLSTM tests: chunkwise mLSTM vs a naive per-step numpy recurrence, state
carry invariance, encoder shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import XLSTMConfig
from statecatcher_tpu.models.xlstm import XLSTMEncoder, mlstm_chunkwise


def numpy_mlstm_step(q, k, v, i_raw, f_raw, C, n, m, cap=15.0):
    """One stabilized mLSTM step, straight from the paper (independent)."""
    def softcap(x):
        return cap * np.tanh(x / cap)

    def logsig(x):
        return -np.log1p(np.exp(-x))

    lf = logsig(softcap(f_raw))
    ii = softcap(i_raw)
    m_new = max(lf + m, ii)
    C_new = np.exp(lf + m - m_new) * C + np.exp(ii - m_new) * np.outer(k, v)
    n_new = np.exp(lf + m - m_new) * n + np.exp(ii - m_new) * k
    qs = q / np.sqrt(len(q))
    num = qs @ C_new
    denom = max(abs(qs @ n_new), np.exp(-m_new))
    return num / denom, C_new, n_new, m_new


def numpy_mlstm(q, k, v, i_raw, f_raw, C0, n0, m0):
    B, H, T, dqk = q.shape
    dv = v.shape[-1]
    h = np.zeros((B, H, T, dv))
    C_T = np.zeros_like(C0)
    n_T = np.zeros_like(n0)
    m_T = np.zeros_like(m0)
    for b in range(B):
        for hh in range(H):
            C, n, m = C0[b, hh].copy(), n0[b, hh].copy(), float(m0[b, hh])
            for t in range(T):
                h[b, hh, t], C, n, m = numpy_mlstm_step(
                    q[b, hh, t], k[b, hh, t], v[b, hh, t],
                    i_raw[b, hh, t], f_raw[b, hh, t], C, n, m,
                )
            C_T[b, hh], n_T[b, hh], m_T[b, hh] = C, n, m
    return h, C_T, n_T, m_T


def _rand(rng, B=2, H=2, T=20, dqk=4, dv=6):
    q = rng.standard_normal((B, H, T, dqk)).astype(np.float32)
    k = rng.standard_normal((B, H, T, dqk)).astype(np.float32)
    v = rng.standard_normal((B, H, T, dv)).astype(np.float32)
    i_raw = rng.standard_normal((B, H, T)).astype(np.float32)
    f_raw = (rng.standard_normal((B, H, T)) + 2.0).astype(np.float32)
    C0 = np.zeros((B, H, dqk, dv), np.float32)
    n0 = np.zeros((B, H, dqk), np.float32)
    m0 = np.zeros((B, H), np.float32)
    return q, k, v, i_raw, f_raw, C0, n0, m0


@pytest.mark.parametrize("chunk", [4, 8, 64])
def test_chunkwise_matches_stepwise(rng, chunk):
    args = _rand(rng)
    h, C, n, m = mlstm_chunkwise(*map(jnp.asarray, args), chunk_size=chunk)
    want_h, want_C, want_n, want_m = numpy_mlstm(*args)
    np.testing.assert_allclose(np.asarray(h), want_h, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(C), want_C, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(n), want_n, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(m), want_m, rtol=2e-3, atol=2e-3)


def test_chunkwise_nonzero_initial_state(rng):
    q, k, v, i_raw, f_raw, C0, n0, m0 = _rand(rng, T=12)
    C0 = rng.standard_normal(C0.shape).astype(np.float32) * 0.3
    n0 = np.abs(rng.standard_normal(n0.shape)).astype(np.float32) * 0.3
    m0 = rng.standard_normal(m0.shape).astype(np.float32) * 0.2
    h, C, n, m = mlstm_chunkwise(
        *map(jnp.asarray, (q, k, v, i_raw, f_raw, C0, n0, m0)), chunk_size=4
    )
    want = numpy_mlstm(q, k, v, i_raw, f_raw, C0, n0, m0)
    np.testing.assert_allclose(np.asarray(h), want[0], rtol=2e-3, atol=2e-3)


def test_chunkwise_carry_invariance(rng):
    """2T in one call == two T-calls with carried (C, n, m)."""
    q, k, v, i_raw, f_raw, C0, n0, m0 = _rand(rng, T=16)
    full = mlstm_chunkwise(
        *map(jnp.asarray, (q, k, v, i_raw, f_raw, C0, n0, m0)), chunk_size=8
    )
    half1 = mlstm_chunkwise(
        jnp.asarray(q[:, :, :8]), jnp.asarray(k[:, :, :8]), jnp.asarray(v[:, :, :8]),
        jnp.asarray(i_raw[:, :, :8]), jnp.asarray(f_raw[:, :, :8]),
        jnp.asarray(C0), jnp.asarray(n0), jnp.asarray(m0), chunk_size=8,
    )
    half2 = mlstm_chunkwise(
        jnp.asarray(q[:, :, 8:]), jnp.asarray(k[:, :, 8:]), jnp.asarray(v[:, :, 8:]),
        jnp.asarray(i_raw[:, :, 8:]), jnp.asarray(f_raw[:, :, 8:]),
        half1[1], half1[2], half1[3], chunk_size=8,
    )
    np.testing.assert_allclose(
        np.asarray(full[0][:, :, 8:]), np.asarray(half2[0]), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(full[1:], half2[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_encoder_shapes_and_carry(rng):
    cfg = XLSTMConfig(embedding_dim=32, num_heads=2, num_blocks=2, chunk_size=8)
    enc = XLSTMEncoder(input_dim=10, vocab_size=17, cfg=cfg)
    x = jnp.asarray(rng.standard_normal((2, 20, 10)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    logits, state = enc.apply(params, x)
    assert logits.shape == (2, 20, 17)
    assert state["C"].shape[1] == 2
    # zero-init vocab head
    assert np.allclose(np.asarray(logits), 0.0)

    # carry invariance through the full encoder
    y_full, st_full = enc.apply(params, x)
    y1, st1 = enc.apply(params, x[:, :10])
    y2, st2 = enc.apply(params, x[:, 10:], st1)
    np.testing.assert_allclose(np.asarray(y_full[:, 10:]), np.asarray(y2),
                               rtol=1e-4, atol=1e-4)
    for key in ("C", "n", "m"):
        np.testing.assert_allclose(np.asarray(st_full[key]), np.asarray(st2[key]),
                                   rtol=1e-4, atol=1e-4)


def test_encoder_gradients_flow(rng):
    cfg = XLSTMConfig(embedding_dim=16, num_heads=2, num_blocks=1, chunk_size=8)
    enc = XLSTMEncoder(input_dim=8, vocab_size=9, cfg=cfg)
    x = jnp.asarray(rng.standard_normal((2, 8, 8)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    # the vocab head is zero-init (no gradient reaches the body through it at
    # step 0, same as the reference's zero-init output proj) — give it a
    # nonzero kernel so this test sees gradient flow end to end
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.full_like(v, 0.01)
        if any(getattr(p, "key", None) == "vocab_proj" for p in path)
        and v.ndim == 2 else v,
        params,
    )

    def loss(p):
        logits, state = enc.apply(p, x)
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(params)
    gq = np.asarray(g["params"]["block0_mlstm"]["q"]["kernel"])
    assert np.isfinite(gq).all() and np.abs(gq).max() > 0


def test_recurrent_matches_chunkwise(rng):
    """kernel_impl="recurrent" (sequential step path) == chunkwise."""
    from statecatcher_tpu.models.xlstm import mlstm_recurrent

    q, k, v, i_raw, f_raw, C0, n0, m0 = _rand(rng, T=20)
    C0 = rng.standard_normal(C0.shape).astype(np.float32) * 0.3
    m0 = rng.standard_normal(m0.shape).astype(np.float32) * 0.2
    ref = mlstm_chunkwise(
        *map(jnp.asarray, (q, k, v, i_raw, f_raw, C0, n0, m0)), chunk_size=8
    )
    got = mlstm_recurrent(
        *map(jnp.asarray, (q, k, v, i_raw, f_raw, C0, n0, m0))
    )
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("T", [16, 20])      # aligned and ragged (pad path)
def test_pallas_matches_chunkwise(rng, T):
    """kernel_impl="pallas" forward == chunkwise (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from statecatcher_tpu.ops.mlstm_pallas import mlstm_chunkwise_pallas

    q, k, v, i_raw, f_raw, C0, n0, m0 = _rand(rng, T=T)
    C0 = rng.standard_normal(C0.shape).astype(np.float32) * 0.3
    m0 = rng.standard_normal(m0.shape).astype(np.float32) * 0.2
    args = tuple(map(jnp.asarray, (q, k, v, i_raw, f_raw, C0, n0, m0)))
    ref = mlstm_chunkwise(*args, chunk_size=8)
    with pltpu.force_tpu_interpret_mode():
        got = mlstm_chunkwise_pallas(*args, 8)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_gradients_match_chunkwise(rng):
    """The custom VJP (XLA recompute) == autodiff of the chunkwise form."""
    from jax.experimental.pallas import tpu as pltpu

    from statecatcher_tpu.ops.mlstm_pallas import mlstm_chunkwise_pallas

    q, k, v, i_raw, f_raw, C0, n0, m0 = _rand(rng, T=16)
    args = tuple(map(jnp.asarray, (q, k, v, i_raw, f_raw, C0, n0, m0)))

    def loss_ref(*a):
        h, C, n, m = mlstm_chunkwise(*a, chunk_size=8)
        return jnp.sum(h * h) + jnp.sum(C) + jnp.sum(n) + jnp.sum(m)

    def loss_pal(*a):
        h, C, n, m = mlstm_chunkwise_pallas(*a, 8)
        return jnp.sum(h * h) + jnp.sum(C) + jnp.sum(n) + jnp.sum(m)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(*args)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_encoder_kernel_impl_dispatch(rng):
    """Every XLSTMConfig.kernel_impl value changes the executed path but not
    the result; an unknown value raises."""
    from statecatcher_tpu.models.xlstm import xlstm_init_carry
    from jax.experimental.pallas import tpu as pltpu

    x = rng.standard_normal((2, 12, 16)).astype(np.float32)
    outs = {}
    for impl in ("chunkwise", "recurrent", "pallas"):
        cfg = XLSTMConfig(embedding_dim=16, num_heads=2, num_blocks=1,
                          chunk_size=4, kernel_impl=impl)
        enc = XLSTMEncoder(input_dim=16, vocab_size=7, cfg=cfg)
        state0 = xlstm_init_carry(cfg, 2)
        with pltpu.force_tpu_interpret_mode():
            params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
            logits, new_state = enc.apply(params, jnp.asarray(x), state0)
        outs[impl] = (np.asarray(logits), np.asarray(new_state["m"]))
    for impl in ("recurrent", "pallas"):
        np.testing.assert_allclose(outs[impl][0], outs["chunkwise"][0],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(outs[impl][1], outs["chunkwise"][1],
                                   rtol=1e-4, atol=1e-4)
    bad = XLSTMConfig(embedding_dim=16, num_heads=2, num_blocks=1,
                      kernel_impl="nope")
    enc = XLSTMEncoder(input_dim=16, vocab_size=7, cfg=bad)
    with pytest.raises(ValueError, match="kernel_impl"):
        enc.init(jax.random.PRNGKey(0), jnp.asarray(x))


@pytest.mark.tpu
def test_pallas_on_chip_matches_chunkwise(rng):
    """Real-hardware lowering check at BH > 1 and chunk_size=128 — the
    Mosaic block-layout/lane-alignment regression class that interpret mode
    cannot catch (round-3 fixes: rank-3 singleton blocks, cumsum→tri-matmul,
    no scalar VMEM stores)."""
    from statecatcher_tpu.ops.mlstm_pallas import mlstm_chunkwise_pallas

    q, k, v, i_raw, f_raw, C0, n0, m0 = _rand(rng, B=2, H=2, T=200,
                                              dqk=128, dv=128)
    C0 = rng.standard_normal(C0.shape).astype(np.float32) * 0.1
    args = tuple(map(jnp.asarray, (q, k, v, i_raw, f_raw, C0, n0, m0)))
    ref = mlstm_chunkwise(*args, chunk_size=128)
    got = jax.jit(
        lambda *a: mlstm_chunkwise_pallas(*a, 128)
    )(*args)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
