import numpy as np
import pytest

from statecatcher_tpu.data.audio import (
    decode_audio,
    read_wav_bytes,
    resample_linear,
    to_mono,
    write_wav_bytes,
)


def test_wav_roundtrip(rng):
    x = rng.uniform(-0.9, 0.9, size=16000).astype(np.float32)
    blob = write_wav_bytes(x, 16000)
    y, sr, ch = read_wav_bytes(blob)
    assert sr == 16000 and ch == 1
    # int16 quantization error bound
    assert np.max(np.abs(np.asarray(y) - x)) < 1.0 / 32000


def test_decode_audio_wav_path(rng):
    x = rng.uniform(-0.5, 0.5, size=8000).astype(np.float32)
    blob = write_wav_bytes(x, 16000)
    y = decode_audio(blob, 16000)
    assert y.dtype == np.float32
    assert len(y) == 8000


def test_decode_audio_resamples(rng):
    x = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000).astype(np.float32)
    blob = write_wav_bytes(x, 8000)
    y = decode_audio(blob, 16000)
    assert abs(len(y) - 16000) <= 1


def test_decode_non_wav_raises_without_ffmpeg():
    from statecatcher_tpu.data import audio as audio_mod

    if audio_mod.have_ffmpeg():
        pytest.skip("ffmpeg present; non-wav path handled by subprocess")
    with pytest.raises(RuntimeError):
        decode_audio(b"\x00" * 100, 16000)


def test_to_mono():
    stereo = np.stack([np.ones(10), np.zeros(10)], axis=1).astype(np.float32)
    mono = to_mono(stereo)
    assert mono.shape == (10,)
    assert np.allclose(mono, 0.5)


def test_resample_linear_identity():
    x = np.arange(100, dtype=np.float32)
    assert resample_linear(x, 16000, 16000) is x


def test_resample_linear_halves():
    x = np.arange(100, dtype=np.float32)
    y = resample_linear(x, 16000, 8000)
    assert len(y) == 50
