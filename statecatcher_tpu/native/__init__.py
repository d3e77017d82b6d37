"""Native (C++) host-data-plane acceleration, loaded via ctypes.

The shared library is built on demand from ``csrc/`` with g++ (``make`` in
this directory, or automatically on first import).  Everything here has a
pure-Python fallback — ``available()`` reports whether the native path is
active; behavior is identical either way (cross-checked by tests).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("statecatcher.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libstatecatcher_native.so")
_lib = None
_tried = False


def _build() -> bool:
    srcs = [os.path.join(_DIR, "csrc", f) for f in ("audio.cc", "tokenizer.cc")]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH] + srcs
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
    except Exception as e:
        logger.info("native build unavailable: %s", e)
        return False
    if proc.returncode != 0:
        logger.warning("native build failed:\n%s", proc.stderr.decode("utf-8", "replace"))
        return False
    return True


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("STATECATCHER_NO_NATIVE") == "1":
        return None
    if not os.path.exists(_LIB_PATH):
        newer_src = True
    else:
        lib_mtime = os.path.getmtime(_LIB_PATH)
        newer_src = any(
            os.path.getmtime(os.path.join(_DIR, "csrc", f)) > lib_mtime
            for f in ("audio.cc", "tokenizer.cc")
        )
    if newer_src and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("failed to load native lib: %s", e)
        return None

    lib.sc_decode_wav.restype = ctypes.c_long
    lib.sc_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
    ]
    lib.sc_wav_sample_rate.restype = ctypes.c_int
    lib.sc_wav_sample_rate.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.sc_vocab_create.restype = ctypes.c_void_p
    lib.sc_vocab_create.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.sc_vocab_destroy.restype = None
    lib.sc_vocab_destroy.argtypes = [ctypes.c_void_p]
    lib.sc_viterbi_encode.restype = ctypes.c_int
    lib.sc_viterbi_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# --------------------------------------------------------------------------- #
# Audio
# --------------------------------------------------------------------------- #
def decode_wav_native(data: bytes, target_sr: int):
    """Native WAV decode → float32 mono at target_sr, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    n = lib.sc_decode_wav(data, len(data), target_sr, None, 0)
    if n < 0:
        return None
    out = np.empty(n, dtype=np.float32)
    lib.sc_decode_wav(
        data, len(data), target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    return out


# --------------------------------------------------------------------------- #
# Tokenizer
# --------------------------------------------------------------------------- #
class NativeVocab:
    """Viterbi-encode handle over a (piece, id, score) table."""

    def __init__(self, pieces: list[str], ids: list[int], scores: list[float]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        blobs = [p.encode("utf-8") for p in pieces]
        blob = b"".join(blobs)
        lens = np.array([len(b) for b in blobs], dtype=np.int32)
        ids_a = np.array(ids, dtype=np.int32)
        scores_a = np.array(scores, dtype=np.float32)
        self._handle = lib.sc_vocab_create(
            blob,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ids_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(pieces),
        )
        self._buf = np.empty(4096, dtype=np.int32)

    def encode_word(self, word: str):
        """Returns list of ids, or None if unsegmentable."""
        wb = word.encode("utf-8")
        n = self._lib.sc_viterbi_encode(
            self._handle, wb, len(wb),
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(self._buf),
        )
        if n < 0:
            return None
        return [int(x) for x in self._buf[:n]]

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.sc_vocab_destroy(self._handle)
            self._handle = None
