"""Frontend numerics tests.

The jitted frontend is checked against a deliberately different
implementation: an explicit per-frame numpy STFT loop, a loop-built mel
triangle bank, and torch.stft (torch CPU is available; torchaudio is not —
its formulas are reproduced in SURVEY.md Appendix B / reference
model.py:250-279).
"""

import numpy as np
import pytest

from statecatcher_tpu.config import FrontendConfig
from statecatcher_tpu.frontend import (
    amplitude_to_db,
    compute_features,
    compute_frame_mask,
    dct_matrix,
    feat_dim,
    hann_window_periodic,
    mel_filterbank,
    num_frames,
    power_spectrogram,
)


def numpy_stft_power(x, n_fft, hop, win):
    """Naive per-frame loop spectrogram (independent of the JAX impl)."""
    T = 1 + (len(x) - n_fft) // hop
    out = np.zeros((T, n_fft // 2 + 1), dtype=np.float64)
    for t in range(T):
        frame = x[t * hop:t * hop + n_fft] * win
        out[t] = np.abs(np.fft.rfft(frame)) ** 2
    return out


def numpy_mel_fb_loop(n_freqs, n_mels, sr):
    """Loop-built HTK triangle bank (independent construction)."""
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, sr / 2, n_freqs)
    pts = mel2hz(np.linspace(hz2mel(0.0), hz2mel(sr / 2), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, cen, hi = pts[m], pts[m + 1], pts[m + 2]
        for f in range(n_freqs):
            if lo <= freqs[f] <= cen and cen > lo:
                fb[f, m] = (freqs[f] - lo) / (cen - lo)
            elif cen < freqs[f] <= hi and hi > cen:
                fb[f, m] = (hi - freqs[f]) / (hi - cen)
    return fb


CFG = FrontendConfig()


def test_num_frames():
    # 16 s @16 kHz, n_fft=400, hop=160, center=False
    assert num_frames(256000, CFG) == 1 + (256000 - 400) // 160


def test_window_matches_torch():
    torch = pytest.importorskip("torch")
    w = hann_window_periodic(400)
    tw = torch.hann_window(400, periodic=True).numpy()
    np.testing.assert_allclose(w, tw, atol=1e-6)


def test_power_spectrogram_vs_numpy_loop(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    got = np.asarray(power_spectrogram(x[None], CFG))[0]
    want = numpy_stft_power(x, 400, 160, hann_window_periodic(400))
    assert got.shape == want.shape
    # float32 rfft vs float64 loop: relative agreement to ~5e-3
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-2)


def test_power_spectrogram_vs_torch_stft(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal(4000).astype(np.float32)
    got = np.asarray(power_spectrogram(x[None], CFG))[0]  # (T, F)
    tx = torch.from_numpy(x)
    st = torch.stft(
        tx, n_fft=400, hop_length=160, win_length=400,
        window=torch.hann_window(400), center=False, return_complex=True,
    )
    want = (st.abs() ** 2).numpy().T  # (T, F)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mel_fb_matches_loop_construction():
    fb = mel_filterbank(201, 80, 16000)
    want = numpy_mel_fb_loop(201, 80, 16000)
    np.testing.assert_allclose(fb, want, atol=1e-5)


def test_dct_orthonormal():
    d = dct_matrix(80, 80, "ortho")
    # DCT-II with ortho norm is orthonormal: D^T D = I
    np.testing.assert_allclose(d.T @ d, np.eye(80), atol=1e-4)


def test_amplitude_to_db_clamps_per_utterance():
    import jax.numpy as jnp

    x = jnp.stack([
        jnp.full((4, 4), 1.0),
        jnp.full((4, 4), 1e-12),  # tiny → would be -120 dB unclamped
    ])
    db = np.asarray(amplitude_to_db(x, top_db=80.0))
    assert np.allclose(db[0], 0.0)
    # second utterance max is its own max (=-100dB after amin), clamp within 80
    assert db[1].max() - db[1].min() <= 80.0 + 1e-5


def test_features_shapes():
    x = np.zeros((2, 16000), dtype=np.float32)
    for kind in ("mfcc", "mel"):
        cfg = FrontendConfig(kind=kind)
        f = np.asarray(compute_features(x, cfg))
        assert f.shape == (2, num_frames(16000, cfg), feat_dim(cfg))
        assert np.all(np.isfinite(f))


def test_mfcc_known_tone():
    # A pure tone should put most mel energy near its frequency band
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    cfg = FrontendConfig(kind="mel")
    mel_db = np.asarray(compute_features(x, cfg))[0]
    band = mel_db.mean(axis=0)
    fb = mel_filterbank(201, 80, sr)
    freqs = np.linspace(0, sr / 2, 201)
    centers = (fb * freqs[:, None]).sum(0) / np.maximum(fb.sum(0), 1e-9)
    peak_band = band.argmax()
    assert abs(centers[peak_band] - 1000) < 150


def test_compute_frame_mask_reference_semantics():
    import jax.numpy as jnp

    B, S, T = 2, 1600, 10
    mask = np.zeros((B, S), dtype=bool)
    mask[0, :800] = True   # half valid
    mask[1, :] = True
    fm, lens = compute_frame_mask(jnp.asarray(mask), T)
    fm = np.asarray(fm)
    assert fm.shape == (B, T)
    # subsample = 160; frame valid iff ANY sample in its 160-window is valid
    assert fm[0].sum() == 5
    assert fm[1].all()
    np.testing.assert_array_equal(np.asarray(lens), [5, 10])
