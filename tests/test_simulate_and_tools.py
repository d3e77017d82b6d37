"""Tests for the simulator and tokenizer-trainer CLIs."""

import os

import numpy as np

from statecatcher_tpu.config import Config
from statecatcher_tpu.data.audio import write_wav_bytes


def _fixtures(tmp_path, rng, n=3):
    tmp_path.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        sr = 8000
        x = rng.uniform(-0.3, 0.3, size=3 * sr).astype(np.float32)
        (tmp_path / f"r{i}.wav").write_bytes(write_wav_bytes(x, sr))
        (tmp_path / f"r{i}.vtt").write_text(
            "WEBVTT\n\n00:00:00.000 --> 00:00:01.500\nhello world\n\n"
            "00:00:01.500 --> 00:00:03.000\ntesting simulator\n"
        )
    return str(tmp_path)


def test_simulate_loop(tmp_path, rng):
    from statecatcher_tpu.simulate import simulate_training_loop

    root = _fixtures(tmp_path / "d", rng)
    cfg = Config().apply_overrides([
        "--data.source", "local", "--data.local_dir", root,
        "--data.batch_samplerate", "8000", "--data.batch_size", "2",
        "--data.target_duration", "1.5", "--data.num_workers", "2",
    ])
    stats = simulate_training_loop(cfg, max_batches=2, verbose=False)
    assert stats["batches"] == 2
    assert stats["segments"] >= 2
    assert stats["audio_seconds"] > 0


def test_train_tokenizer_cli(tmp_path, rng):
    from statecatcher_tpu.train_tokenizer import main
    from statecatcher_tpu.tokenizer import load_tokenizer

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(["hello world testing"] * 20))
    prefix = str(tmp_path / "tok")
    rc = main(["--input", str(corpus), "--model-prefix", prefix,
               "--vocab-size", "48"])
    assert rc == 0
    tok = load_tokenizer(prefix + ".json")
    ids = tok.encode("hello world")
    assert ids and tok.decode_ids(ids) == "hello world"


def test_train_tokenizer_from_vtt_dir(tmp_path, rng):
    from statecatcher_tpu.train_tokenizer import main
    from statecatcher_tpu.tokenizer import load_tokenizer

    root = _fixtures(tmp_path / "d", rng)
    prefix = str(tmp_path / "tok")
    rc = main(["--input", root, "--model-prefix", prefix,
               "--vocab-size", "32", "--backend", "char"])
    assert rc == 0
    tok = load_tokenizer(prefix + ".json")
    assert tok.decode_ids(tok.encode("hello")) == "hello"


def test_simulate_debug_spectrograms(tmp_path, rng, monkeypatch):
    from statecatcher_tpu.simulate import simulate_training_loop

    root = _fixtures(tmp_path / "d", rng)
    monkeypatch.chdir(tmp_path)
    cfg = Config().apply_overrides([
        "--data.source", "local", "--data.local_dir", root,
        "--data.batch_samplerate", "8000", "--data.batch_size", "2",
        "--data.target_duration", "1.5", "--data.num_workers", "2",
    ])
    simulate_training_loop(cfg, max_batches=1, verbose=False,
                           debug_spectrograms=True)
    plots = list((tmp_path / "plots").glob("*.pdf"))
    assert plots, "waveform plot PDFs should be written"
