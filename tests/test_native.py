"""Native C++ layer tests: build, load, and exact agreement with the pure
Python fallbacks."""

import numpy as np
import pytest

from statecatcher_tpu.data.audio import (
    read_wav_bytes,
    resample_linear,
    to_mono,
    write_wav_bytes,
)


@pytest.fixture(scope="module")
def native():
    import statecatcher_tpu.native as nat

    if not nat.available():
        pytest.skip("native library not buildable on this host")
    return nat


def test_native_wav_matches_python(native, rng):
    x = rng.uniform(-0.9, 0.9, size=16000).astype(np.float32)
    blob = write_wav_bytes(x, 16000)
    got = native.decode_wav_native(blob, 16000)
    want, sr, _ = read_wav_bytes(blob)
    np.testing.assert_array_equal(got, to_mono(want))


def test_native_wav_resample_matches_python(native, rng):
    x = rng.uniform(-0.5, 0.5, size=8000).astype(np.float32)
    blob = write_wav_bytes(x, 8000)
    got = native.decode_wav_native(blob, 16000)
    raw, _, _ = read_wav_bytes(blob)
    want = resample_linear(to_mono(raw), 8000, 16000)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_wav_rejects_garbage(native):
    assert native.decode_wav_native(b"nonsense" * 10, 16000) is None


def test_native_viterbi_matches_python(native):
    from statecatcher_tpu.tokenizer.unigram import UnigramTokenizer, _viterbi_segment

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
    ] * 10
    tok = UnigramTokenizer.train(corpus, vocab_size=64)
    assert tok._native is not None
    for text in ("the quick brown fox", "lazy dozen jugs", "a b c"):
        native_ids = tok.encode(text)
        # force the python path
        py_ids = []
        for w in text.split():
            word = "▁" + w
            seg = _viterbi_segment(word, tok._logp, tok._max_len)
            assert seg, f"python path failed to segment {word!r}"
            py_ids.extend(tok._id_of[p] for p in seg)
        assert native_ids == py_ids


def test_native_viterbi_unknown_char_fallback(native):
    from statecatcher_tpu.tokenizer.unigram import UnigramTokenizer

    tok = UnigramTokenizer.train(["abc abc"] * 5, vocab_size=16)
    ids = tok.encode("ab¤c")
    assert UnigramTokenizer.UNK in ids
