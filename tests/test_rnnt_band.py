"""Banded (pruned) RNN-T (ops/rnnt_band.py), interpret mode on CPU:

- full-width band == the exact fused loss (value + gradients)
- narrow band == a numpy brute-force DP restricted to the same band
- band offsets always cover each utterance's (t_len−1, u_len) corner
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import statecatcher_tpu.ops.rnnt_band as rb
from statecatcher_tpu.ops.rnnt import rnnt_loss_fused


@pytest.fixture(autouse=True)
def _interpret():
    rb._INTERPRET[0] = True
    yield
    rb._INTERPRET[0] = False


def _inputs(rng, B=3, T=24, U=10, J=8, V=20):
    enc = jnp.asarray(rng.standard_normal((B, T, J)).astype(np.float32) * 0.4)
    pred = jnp.asarray(rng.standard_normal((B, U + 1, J)).astype(np.float32) * 0.4)
    jk = jnp.asarray(rng.standard_normal((J, V)).astype(np.float32) * 0.3)
    jb = jnp.asarray(rng.standard_normal((V,)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    t_lens = jnp.asarray([T, T - 5, T - 9], np.int32)[:B]
    u_lens = jnp.asarray([U, U - 3, U - 6], np.int32)[:B]
    return enc, pred, jk, jb, labels, t_lens, u_lens


def test_full_band_equals_exact(rng):
    enc, pred, jk, jb, labels, t_lens, u_lens = _inputs(rng)
    U = labels.shape[1]

    def exact(enc, pred, jk, jb):
        return rnnt_loss_fused(enc, pred, jk, jb, labels, t_lens, u_lens,
                               blank_id=0)

    def banded(enc, pred, jk, jb):
        return rb.rnnt_loss_banded(enc, pred, jk, jb, labels, t_lens, u_lens,
                                   blank_id=0, band=U + 1)

    le, ge = jax.value_and_grad(exact, argnums=(0, 1, 2, 3))(enc, pred, jk, jb)
    lb, gb = jax.value_and_grad(banded, argnums=(0, 1, 2, 3))(enc, pred, jk, jb)
    np.testing.assert_allclose(float(lb), float(le), rtol=1e-5)
    for name, a, b in zip(["d_enc", "d_pred", "d_jk", "d_jb"], ge, gb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def _numpy_banded_nll(blank, emit, o_t, t_len, u_len):
    """Brute-force banded DP on dense (T, U1) blank / (T, U) emit tables:
    α over cells with o_t[t] <= u < o_t[t] + Wp only."""
    NEG = -1e30

    def lse(a, b):
        m = max(a, b)
        if m <= NEG / 2:
            return NEG
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    T, U1 = blank.shape
    Wp = _numpy_banded_nll.Wp
    alpha = np.full((T, U1), NEG)
    for t in range(t_len):
        lo = o_t[t]
        for u in range(U1):
            if not (lo <= u < lo + Wp):
                continue
            if t == 0 and u == 0:
                alpha[t, u] = 0.0
                continue
            best = NEG
            if t > 0 and o_t[t - 1] <= u < o_t[t - 1] + Wp:
                best = lse(best, alpha[t - 1, u] + blank[t - 1, u])
            if u > 0 and lo <= u - 1:
                best = lse(best, alpha[t, u - 1] + emit[t, u - 1])
            alpha[t, u] = best
    return -(alpha[t_len - 1, u_len] + blank[t_len - 1, u_len])


def test_narrow_band_matches_numpy_band_dp(rng):
    from statecatcher_tpu.ops.rnnt_pallas import _round_up

    enc, pred, jk, jb, labels, t_lens, u_lens = _inputs(rng, B=3, T=40, U=24)
    t_lens = jnp.asarray([40, 35, 31], np.int32)
    u_lens = jnp.asarray([24, 21, 12], np.int32)
    B, T, _ = enc.shape
    U = labels.shape[1]
    band, Tb = 4, 8
    Wp = _round_up(min(band + 8 + Tb, U + 1 + 8), 8)
    Tp = _round_up(T, Tb)
    U1p = _round_up(max(U + 1, Wp), 8)
    o = np.asarray(rb.band_offsets(t_lens, u_lens, Tp, U1p, Wp, Tb))
    _numpy_banded_nll.Wp = Wp

    got = rb.rnnt_loss_banded(enc, pred, jk, jb, labels, t_lens, u_lens,
                              blank_id=0, band=band, time_block=Tb)

    # dense blank/emit via the exact joint math in numpy
    import statecatcher_tpu.ops.rnnt as rn

    def dense_tables(b):
        joint = np.tanh(np.asarray(enc)[b][:, None, :]
                        + np.asarray(pred)[b][None, :, :])
        logits = joint @ np.asarray(jk) + np.asarray(jb)
        lz = logits.max(-1, keepdims=True)
        lz = lz + np.log(np.exp(logits - lz).sum(-1, keepdims=True))
        lp = logits - lz
        blank = lp[:, :, 0]
        emit = np.take_along_axis(
            lp[:, :U, :], np.asarray(labels)[b][None, :, None], axis=2)[:, :, 0]
        return blank, emit

    per = []
    blk_of_t = np.arange(Tp) // Tb
    for b in range(B):
        blank, emit = dense_tables(b)
        o_t = o[b][blk_of_t][:T]
        per.append(_numpy_banded_nll(blank, emit, o_t,
                                     int(t_lens[b]), int(u_lens[b])))
    np.testing.assert_allclose(float(got), np.mean(per), rtol=1e-5)
    # pruning is real: narrow band differs from the exact loss
    exact = rnnt_loss_fused(enc, pred, jk, jb, labels, t_lens, u_lens,
                            blank_id=0)
    assert abs(float(got) - float(exact)) > 1e-6
    # and is an upper bound on the exact NLL (fewer paths summed)
    assert float(got) >= float(exact) - 1e-5


def test_band_offsets_cover_corner(rng):
    t_lens = jnp.asarray([100, 37, 8, 1], np.int32)
    u_lens = jnp.asarray([64, 2, 7, 0], np.int32)
    Tb, Wp, Tp, U1p = 8, 24, 104, 72
    o = np.asarray(rb.band_offsets(t_lens, u_lens, Tp, U1p, Wp, Tb))
    for b in range(4):
        blk = max(int(t_lens[b]) - 1, 0) // Tb
        lo = o[b, blk]
        assert lo <= int(u_lens[b]) < lo + Wp, (b, lo, int(u_lens[b]))
        # monotone non-decreasing offsets (the DP shift assumes δ ≥ 0)
        assert (np.diff(o[b]) >= 0).all()
        assert (o[b] % 8 == 0).all()


def test_resolve_rnnt_band_auto():
    """train.rnnt_band=-1 (default) picks the measured crossover per static
    U bucket; explicit values are honored verbatim."""
    from statecatcher_tpu.train.step import resolve_rnnt_band

    assert resolve_rnnt_band(-1, 16) == 0
    assert resolve_rnnt_band(-1, 48) == 0      # exact wins below the crossover
    assert resolve_rnnt_band(-1, 64) == 32     # band wins from here (+5 %)
    assert resolve_rnnt_band(-1, 128) == 32    # ... and +59 % at U=128
    assert resolve_rnnt_band(0, 128) == 0      # explicit exact
    assert resolve_rnnt_band(16, 128) == 16    # explicit width


def test_degenerate_row_masked_out_of_mean(rng):
    """A row whose band prunes ALL paths (u_len ≥ Wp inside the first/last
    block) must not blow up the batch loss: it is masked out and the mean
    equals the clean rows' banded loss."""
    enc, pred, jk, jb, labels, t_lens, u_lens = _inputs(rng, B=3, T=24, U=24)
    band, Tb = 4, 8
    # row 2 degenerate: t_len ≤ one time block, u_len == U ≥ Wp → the
    # o[:,0]=0 path-start requirement makes its corner uncoverable
    t_lens = jnp.asarray([24, 20, 6], np.int32)
    u_lens = jnp.asarray([10, 8, 24], np.int32)
    loss = rb.rnnt_loss_banded(enc, pred, jk, jb, labels, t_lens, u_lens,
                               blank_id=0, band=band, time_block=Tb)
    assert np.isfinite(float(loss)) and float(loss) < 1e6
    clean = rb.rnnt_loss_banded(enc[:2], pred[:2], jk, jb, labels[:2],
                                t_lens[:2], u_lens[:2],
                                blank_id=0, band=band, time_block=Tb)
    np.testing.assert_allclose(float(loss), float(clean), rtol=1e-5)
    # gradients stay finite too (the masked row contributes zero)
    g = jax.grad(lambda e: rb.rnnt_loss_banded(
        e, pred, jk, jb, labels, t_lens, u_lens,
        blank_id=0, band=band, time_block=Tb))(enc)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.tpu
def test_banded_on_chip_full_band_equals_exact(rng):
    """Compiled banded kernels on the real chip: full-width band == exact."""
    rb._INTERPRET[0] = False
    enc, pred, jk, jb, labels, t_lens, u_lens = _inputs(rng, B=2, T=32, U=12,
                                                        J=64, V=256)
    t_lens = jnp.asarray([32, 25], np.int32)
    u_lens = jnp.asarray([12, 7], np.int32)
    U = labels.shape[1]
    exact = rnnt_loss_fused(enc, pred, jk, jb, labels, t_lens, u_lens,
                            blank_id=0)
    banded = rb.rnnt_loss_banded(enc, pred, jk, jb, labels, t_lens, u_lens,
                                 blank_id=0, band=U + 1)
    np.testing.assert_allclose(float(banded), float(exact), rtol=1e-4)
