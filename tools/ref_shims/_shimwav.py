"""Minimal RIFF/WAVE codec shared by the ffmpeg and soundfile shims.

Supports what the parity fixtures use: PCM16/PCM32/float32, mono or
multi-channel (downmixed), with linear resampling — the same conventions as
statecatcher_tpu/data/audio.py (standalone copy so the reference subprocess
never imports the repo package)."""

import struct

import numpy as np


def read_wav(data):
    """WAV bytes -> (float32 mono array in [-1,1], sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sr, _, _, bits = fmt
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32767.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(payload, dtype="<i4").astype(np.float32) / 2147483647.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(payload, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format {audio_format}/{bits}")
    if channels > 1:
        n = (len(x) // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return x, sr


def resample_linear(x, sr_in, sr_out):
    if sr_in == sr_out or len(x) == 0:
        return x
    n_out = int(round(len(x) * sr_out / sr_in))
    t = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    i0 = np.minimum(t.astype(np.int64), len(x) - 1)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    frac = (t - i0).astype(np.float32)
    return (x[i0] * (1.0 - frac) + x[i1] * frac).astype(np.float32)


def write_wav_s16(x, sr):
    """float32 [-1,1] mono -> PCM16 mono WAV bytes."""
    pcm = np.clip(np.asarray(x, np.float32) * 32767.0, -32768, 32767)
    pcm = pcm.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm
