"""Fused lane-major mLSTM kernels (ops/mlstm_fused.py): interpret-mode
parity of forward AND backward against the XLA chunkwise form
(models/xlstm.py:mlstm_chunkwise), including ragged time tails, gate and
carry gradients, and the layer-level lane epilogue."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import statecatcher_tpu.ops.mlstm_fused as mf
from statecatcher_tpu.models.xlstm import mlstm_chunkwise


@pytest.fixture(autouse=True)
def _interpret(request, monkeypatch):
    if "tpu" in request.keywords:
        return
    monkeypatch.setattr(
        mf, "_fused_fwd_impl",
        functools.partial(mf._fused_fwd_impl.__wrapped__, interpret=True))
    monkeypatch.setattr(
        mf, "_fused_bwd_impl",
        functools.partial(mf._fused_bwd_impl.__wrapped__, interpret=True))


def _data(rng, B, T, H, dqk, dv, dtype=np.float32):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(dtype) * 0.5)
    return dict(
        q=r(B, T, H * dqk), k=r(B, T, H * dqk), v=r(B, T, H * dv),
        i_raw=r(B, T, H) * 2.0, f_raw=r(B, T, H) * 2.0 + 1.0,
        C0=r(B, H, dqk, dv) * 0.1, n0=jnp.abs(r(B, H, dqk)) * 0.1,
        m0=r(B, H) * 0.1,
    )


def _ref(d, chunk, cap=15.0):
    """XLA chunkwise form on the head-transposed layout."""
    B, T, _ = d["q"].shape
    H = d["i_raw"].shape[-1]
    dqk = d["q"].shape[-1] // H
    dv = d["v"].shape[-1] // H
    tr = lambda x, dd: x.reshape(B, T, H, dd).transpose(0, 2, 1, 3)
    h, C_T, n_T, m_T = mlstm_chunkwise(
        tr(d["q"], dqk), tr(d["k"], dqk), tr(d["v"], dv),
        d["i_raw"].transpose(0, 2, 1).astype(jnp.float32),
        d["f_raw"].transpose(0, 2, 1).astype(jnp.float32),
        d["C0"].astype(jnp.float32), d["n0"].astype(jnp.float32),
        d["m0"].astype(jnp.float32), chunk, cap)
    h = h.transpose(0, 2, 1, 3).reshape(B, T, H * dv)
    return h, C_T, n_T, m_T


@pytest.mark.parametrize("T,chunk", [(32, 16), (45, 16), (16, 16), (70, 32)])
def test_fused_forward_matches_chunkwise(rng, T, chunk):
    B, H, dqk, dv = 2, 2, 128, 128
    d = _data(rng, B, T, H, dqk, dv)
    h_f, C_f, n_f, m_f = mf.mlstm_fused(
        d["q"], d["k"], d["v"], d["i_raw"], d["f_raw"],
        d["C0"], d["n0"], d["m0"], chunk)
    h_r, C_r, n_r, m_r = _ref(d, chunk)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(C_f), np.asarray(C_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(n_f), np.asarray(n_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_r),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("T,chunk", [(32, 16), (45, 16)])
def test_fused_grads_match_chunkwise(rng, T, chunk):
    B, H, dqk, dv = 2, 2, 128, 128
    d = _data(rng, B, T, H, dqk, dv)
    wh = jnp.asarray(rng.standard_normal((B, T, H * dv)).astype(np.float32))
    names = ["q", "k", "v", "i_raw", "f_raw", "C0", "n0", "m0"]

    def loss_fused(*args):
        dd = dict(zip(names, args))
        h, C_T, n_T, m_T = mf.mlstm_fused(
            dd["q"], dd["k"], dd["v"], dd["i_raw"], dd["f_raw"],
            dd["C0"], dd["n0"], dd["m0"], chunk)
        return (jnp.sum(h * wh) + jnp.sum(C_T * C_T)
                + jnp.sum(n_T * n_T) + jnp.sum(jnp.sin(m_T)))

    def loss_ref(*args):
        dd = dict(zip(names, args))
        h, C_T, n_T, m_T = _ref(dd, chunk)
        return (jnp.sum(h * wh) + jnp.sum(C_T * C_T)
                + jnp.sum(n_T * n_T) + jnp.sum(jnp.sin(m_T)))

    args = tuple(d[n] for n in names)
    vf, gf = jax.value_and_grad(loss_fused, argnums=tuple(range(8)))(*args)
    vr, gr = jax.value_and_grad(loss_ref, argnums=tuple(range(8)))(*args)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-4)
    for n, a, b in zip(names, gr, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4,
            err_msg=f"d_{n}")


def test_fused_layer_in_encoder(rng):
    """XLSTMEncoder forward/backward with kernel_impl='fused' matches
    'chunkwise' on the same params (the lane epilogue is a pure relayout)."""
    from statecatcher_tpu.config import XLSTMConfig
    from statecatcher_tpu.models.xlstm import XLSTMEncoder, xlstm_init_carry

    B, T, F = 2, 40, 24
    cfg_f = XLSTMConfig(embedding_dim=256, num_heads=2, num_blocks=2,
                        chunk_size=16, kernel_impl="fused")
    cfg_c = XLSTMConfig(embedding_dim=256, num_heads=2, num_blocks=2,
                        chunk_size=16, kernel_impl="chunkwise")
    enc_f = XLSTMEncoder(input_dim=F, vocab_size=32, cfg=cfg_f)
    enc_c = XLSTMEncoder(input_dim=F, vocab_size=32, cfg=cfg_c)
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    params = enc_c.init(jax.random.PRNGKey(0), x)
    carry = xlstm_init_carry(cfg_f, B)

    def run(enc, p):
        logits, st = enc.apply(p, x, carry)
        return logits, st

    lo_f, st_f = run(enc_f, params)
    lo_c, st_c = run(enc_c, params)
    np.testing.assert_allclose(np.asarray(lo_f), np.asarray(lo_c),
                               rtol=2e-4, atol=2e-5)
    for key in ("C", "n", "m"):
        np.testing.assert_allclose(
            np.asarray(st_f[key]), np.asarray(st_c[key]),
            rtol=2e-4, atol=2e-5, err_msg=key)

    gw = jnp.asarray(rng.standard_normal(lo_c.shape).astype(np.float32))
    gf = jax.grad(lambda p: jnp.sum(run(enc_f, p)[0] * gw))(params)
    gc = jax.grad(lambda p: jnp.sum(run(enc_c, p)[0] * gw))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_c = jax.tree_util.tree_leaves_with_path(gc)
    for (pf, af), (_, ac) in zip(flat_f, flat_c):
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ac), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(pf))


def _assert_close_normwise(a, b, name, rel_fro=2e-2, max_frac=0.05):
    """On-chip comparison for the conditioning-limited mLSTM chain: measured
    on the chip, XLA-default vs XLA-highest-precision evaluations of the
    SAME math already differ by ~1 % worst-element (exp-amplified f32), so
    element-wise tolerances are meaningless.  A lowering bug (wrong chunk
    index, bad lane slice) produces O(100 %) errors; precision noise stays
    ~1 %.  Gate on relative Frobenius error + worst element vs global scale.
    """
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    fro = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)
    assert fro <= rel_fro, f"{name}: rel Frobenius error {fro:.2e}"
    scale = np.abs(a).max() + 1e-30
    assert np.abs(a - b).max() <= max_frac * scale, (
        f"{name}: worst deviation {np.abs(a - b).max():.3e} "
        f"vs scale {scale:.3e}")


@pytest.mark.tpu
def test_fused_on_chip_matches_chunkwise(rng):
    """Real-chip compiled kernels at flagship-like shapes (f32)."""
    B, T, H, dqk, dv, chunk = 2, 300, 2, 128, 256, 128
    d = _data(rng, B, T, H, dqk, dv)
    wh = jnp.asarray(rng.standard_normal((B, T, H * dv)).astype(np.float32))
    names = ["q", "k", "v", "i_raw", "f_raw", "C0", "n0", "m0"]

    def loss_fused(*args):
        dd = dict(zip(names, args))
        h, C_T, n_T, m_T = mf.mlstm_fused(
            dd["q"], dd["k"], dd["v"], dd["i_raw"], dd["f_raw"],
            dd["C0"], dd["n0"], dd["m0"], chunk)
        return jnp.sum(h * wh) + jnp.sum(C_T * C_T) + jnp.sum(n_T * n_T)

    def loss_ref(*args):
        dd = dict(zip(names, args))
        h, C_T, n_T, _ = _ref(dd, chunk)
        return jnp.sum(h * wh) + jnp.sum(C_T * C_T) + jnp.sum(n_T * n_T)

    args = tuple(d[n] for n in names)
    vf, gf = jax.value_and_grad(loss_fused, argnums=tuple(range(8)))(*args)
    vr, gr = jax.value_and_grad(loss_ref, argnums=tuple(range(8)))(*args)
    # accumulation-order differences on ~150k-element f32 sums
    np.testing.assert_allclose(float(vf), float(vr), rtol=5e-4)
    for n, a, b in zip(names, gr, gf):
        _assert_close_normwise(np.asarray(a), np.asarray(b), f"d_{n}")
