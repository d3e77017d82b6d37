"""End-to-end training-slice tests: local fixture data → train() → loss drops,
checkpoints written, resume works (SURVEY.md §7 stages 3-4)."""

import glob
import json
import os

import numpy as np
import pytest

from statecatcher_tpu.config import Config
from statecatcher_tpu.data.audio import write_wav_bytes


def _fixture_dir(tmp_path, rng, n=3, seconds=4, sr=8000):
    tmp_path.mkdir(parents=True, exist_ok=True)
    words = ["hello", "world", "testing", "audio", "stream", "state"]
    for i in range(n):
        x = rng.uniform(-0.3, 0.3, size=seconds * sr).astype(np.float32)
        (tmp_path / f"rec{i}.wav").write_bytes(write_wav_bytes(x, sr))
        lines = ["WEBVTT", ""]
        cue = seconds / 2
        for j in range(2):
            s, e = j * cue, (j + 1) * cue
            lines.append(f"00:00:{s:06.3f} --> 00:00:{e:06.3f}")
            lines.append(" ".join(rng.choice(words, size=3)))
            lines.append("")
        (tmp_path / f"rec{i}.vtt").write_text("\n".join(lines))
    return str(tmp_path)


def _tiny_cfg(local_dir, model_dir, encoder="lstm", **train_over):
    cfg = Config()
    over = [
        "--model.encoder", encoder,
        "--model.hidden_size", "32",
        "--model.num_layers", "2",
        "--data.source", "local",
        "--data.local_dir", local_dir,
        "--data.batch_samplerate", "8000",
        "--data.batch_size", "2",
        "--data.target_duration", "2.0",
        "--data.num_workers", "2",
        "--train.model_dir", model_dir,
        "--train.log_every_n", "4",
        "--train.epochs", "100",
    ]
    for k, v in train_over.items():
        over += [f"--{k}", str(v)]
    return cfg.apply_overrides(over)


@pytest.mark.parametrize("encoder", ["lstm", "lucyrnn"])
def test_train_e2e_loss_decreases(tmp_path, rng, encoder):
    from statecatcher_tpu.train.loop import train

    data = _fixture_dir(tmp_path / "data", rng)
    cfg = _tiny_cfg(data, str(tmp_path / "models"), encoder=encoder)
    cfg = cfg.apply_overrides(["--train.steps", "12", "--train.optim.lr", "3e-3"])
    summary = train(cfg)
    assert summary["global_step"] == 12
    # loss curve from the metrics jsonl
    metrics = [
        json.loads(line)
        for line in open(os.path.join(summary["run_dir"], "metrics.jsonl"))
    ]
    avg_losses = [m["avg_loss_4"] for m in metrics if "avg_loss_4" in m]
    assert len(avg_losses) >= 2
    assert avg_losses[-1] < avg_losses[0]  # it learns *something* on the fixture
    # checkpoint exists
    assert glob.glob(os.path.join(summary["run_dir"], "ckpt", "*"))


def test_train_resume(tmp_path, rng):
    from statecatcher_tpu.train.loop import train

    data = _fixture_dir(tmp_path / "data", rng)
    cfg = _tiny_cfg(data, str(tmp_path / "models"))
    cfg1 = cfg.apply_overrides(["--train.steps", "6"])
    s1 = train(cfg1)
    assert s1["global_step"] == 6

    cfg2 = cfg.apply_overrides(
        ["--train.steps", "10", "--train.resume_from", s1["run_dir"]]
    )
    s2 = train(cfg2)
    # resumed from step 6, ran to 10
    assert s2["global_step"] == 10


def test_train_kill_resume_mid_batch_exact(tmp_path, rng):
    """Full-session checkpointing (SURVEY §5: carry-state buffers + data
    cursor): a run killed mid-recording-batch and resumed must reproduce the
    uninterrupted run's loss sequence exactly.

    steps=3 stops after the first segment of the second recording batch, so
    the resumed run re-enters at seg_idx=1 with the restored carry — if the
    carry or the data cursor were dropped, steps 4-6 would diverge."""
    from statecatcher_tpu.train.loop import train

    data = _fixture_dir(tmp_path / "data", rng)
    cfg = _tiny_cfg(data, str(tmp_path / "models"))

    full = train(cfg.apply_overrides(["--train.steps", "6"]))
    assert full["global_step"] == 6

    part = train(cfg.apply_overrides(["--train.steps", "3"]))
    assert part["global_step"] == 3
    resumed = train(cfg.apply_overrides(
        ["--train.steps", "6", "--train.resume_from", part["run_dir"]]
    ))
    assert resumed["global_step"] == 6

    got = part["loss_history"] + resumed["loss_history"]
    np.testing.assert_allclose(got, full["loss_history"], rtol=0, atol=0)

    # the resumed checkpoint chain carries its own cursor forward
    import json as _json

    meta_files = glob.glob(
        os.path.join(resumed["run_dir"], "ckpt", "*", "meta", "*")
    )
    assert meta_files  # cursor + metrics window persisted
    metas = [_json.load(open(p)) for p in meta_files]
    assert any("cursor" in m for m in metas)


def test_train_e2e_rnnt(tmp_path, rng):
    """RNN-T mode: fused transducer loss end-to-end (config 4 slice)."""
    from statecatcher_tpu.train.loop import train

    data = _fixture_dir(tmp_path / "data", rng)
    cfg = _tiny_cfg(data, str(tmp_path / "models"), encoder="lucyrnn")
    cfg = cfg.apply_overrides([
        "--train.mode", "rnnt",
        "--train.steps", "6",
        "--model.rnnt_pred_emb_dim", "16",
        "--model.rnnt_joiner_dim", "16",
    ])
    summary = train(cfg)
    assert summary["global_step"] == 6
    metrics = [
        json.loads(line)
        for line in open(os.path.join(summary["run_dir"], "metrics.jsonl"))
    ]
    losses = [m["avg_loss_4"] for m in metrics if "avg_loss_4" in m]
    assert losses and all(np.isfinite(l) for l in losses)


def test_train_e2e_stack_order(tmp_path, rng):
    """Frame stacking (reference lucyrnn.py:92-99): encoder runs at T/stack."""
    from statecatcher_tpu.train.loop import train

    data = _fixture_dir(tmp_path / "data", rng)
    cfg = _tiny_cfg(data, str(tmp_path / "models"), encoder="lucyrnn")
    cfg = cfg.apply_overrides([
        "--model.stack_order", "3", "--train.steps", "4",
    ])
    summary = train(cfg)
    assert summary["global_step"] == 4


def test_train_e2e_xlstm(tmp_path, rng):
    """xLSTM encoder end-to-end (config 3 slice)."""
    from statecatcher_tpu.train.loop import train

    data = _fixture_dir(tmp_path / "data", rng)
    cfg = _tiny_cfg(data, str(tmp_path / "models"), encoder="xlstm")
    cfg = cfg.apply_overrides([
        "--model.xlstm.embedding_dim", "32",
        "--model.xlstm.num_blocks", "2",
        "--model.xlstm.chunk_size", "16",
        "--train.steps", "4",
    ])
    summary = train(cfg)
    assert summary["global_step"] == 4


def test_train_e2e_padding_strategy(tmp_path, rng):
    """batch_segment_strategy=padding: K = max segment count, short items
    contribute silence+empty text (reference train.py:455-456,186-201)."""
    from statecatcher_tpu.train.loop import train

    data = _fixture_dir(tmp_path / "data", rng, seconds=6)
    # one much shorter recording → unequal segment counts
    cfg = _tiny_cfg(data, str(tmp_path / "models"))
    cfg = cfg.apply_overrides([
        "--data.batch_segment_strategy", "padding",
        "--train.steps", "5",
    ])
    summary = train(cfg)
    assert summary["global_step"] == 5


def test_train_e2e_rwkv(tmp_path, rng):
    """RWKV encoder end-to-end (beyond the reference's planned-only status)."""
    from statecatcher_tpu.train.loop import train

    data = _fixture_dir(tmp_path / "data", rng)
    cfg = _tiny_cfg(data, str(tmp_path / "models"), encoder="rwkv")
    cfg = cfg.apply_overrides(["--train.steps", "4"])
    summary = train(cfg)
    assert summary["global_step"] == 4


def test_train_e2e_http_source(tmp_path, rng):
    """Full train() over the HTTP data plane against the fake server."""
    import yaml

    from statecatcher_tpu.data.audio import write_wav_bytes
    from statecatcher_tpu.data.fake_server import FakeSpeechDataServer
    from statecatcher_tpu.tokenizer import CharTokenizer
    from statecatcher_tpu.train.loop import train

    recs = []
    for i in range(3):
        sr = 8000
        x = rng.uniform(-0.3, 0.3, size=3 * sr).astype(np.float32)
        vtt = ("WEBVTT\n\n00:00:00.000 --> 00:00:01.500\nhello world\n\n"
               "00:00:01.500 --> 00:00:03.000\nstreaming over http\n")
        recs.append((write_wav_bytes(x, sr), vtt))

    tok = CharTokenizer.train(["hello world streaming over http"])
    tok_path = str(tmp_path / "tok.json")
    tok.save(tok_path)

    with FakeSpeechDataServer(recs) as srv:
        cfg_yaml = tmp_path / "config.yaml"
        cfg_yaml.write_text(yaml.safe_dump(srv.client_config()))
        cfg = Config().apply_overrides([
            "--model.encoder", "lstm", "--model.hidden_size", "16",
            "--model.num_layers", "1",
            "--data.source", "http",
            "--data.config_path", str(cfg_yaml),
            "--data.batch_samplerate", "8000", "--data.batch_size", "2",
            "--data.target_duration", "1.5", "--data.num_workers", "2",
            "--train.model_dir", str(tmp_path / "models"),
            "--train.sp_model", tok_path,
            "--train.steps", "4", "--train.log_every_n", "3",
        ])
        summary = train(cfg)
        assert summary["global_step"] == 4
        assert srv.state.marked_done  # batches acknowledged to the server
        assert any("Completed batch" in m for _, m in srv.state.logs)
