"""soundfile stand-in: the reference reads the ffmpeg-produced WAV stream with
``sf.read(io.BytesIO(out), dtype="int16")`` (reference dataset.py:163)."""

import numpy as np

import _shimwav


def read(file, dtype="float32"):
    data = file.read() if hasattr(file, "read") else open(file, "rb").read()
    x, sr = _shimwav.read_wav(data)
    if dtype == "int16":
        x = np.clip(x * 32767.0, -32768, 32767).astype(np.int16)
    elif dtype == "float32":
        x = x.astype(np.float32)
    else:
        raise ValueError(f"shim supports int16/float32, got {dtype}")
    return x, sr
