"""Streaming recognizer tests: chunked streaming == offline decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config
from statecatcher_tpu.decode import ctc_greedy_decode_to_lists
from statecatcher_tpu.frontend import compute_features
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.streaming import StreamingRecognizer


@pytest.fixture(scope="module")
def setup():
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn",
        "--model.hidden_size", "16",
        "--model.num_layers", "1",
        "--model.vocab_size", "8",
        "--data.batch_samplerate", "8000",
    ])
    model = build_model(cfg.model, 80)
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.5, 0.5, size=8000 * 2).astype(np.float32)
    feats = compute_features(jnp.asarray(audio[None]), cfg.frontend)
    params = model.init(jax.random.PRNGKey(3), feats, init_carry(cfg.model, 1))
    # give the zero-init output projection some signal
    params = jax.tree_util.tree_map(
        lambda v: jax.random.normal(jax.random.PRNGKey(1), v.shape) * 0.5
        if v.ndim == 2 else v, params,
    )
    return cfg, model, params, audio


def _offline_tokens(cfg, model, params, audio, n_frames):
    feats = compute_features(jnp.asarray(audio[None]), cfg.frontend)[:, :n_frames]
    logits, _ = model.apply(params, feats, init_carry(cfg.model, 1), None)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return ctc_greedy_decode_to_lists(lp, jnp.asarray([lp.shape[1]]))[0]


@pytest.mark.parametrize("feed", [160, 1333, 4000])
def test_streaming_matches_offline_greedy(setup, feed):
    cfg, model, params, audio = setup
    rec = StreamingRecognizer(model, params, cfg, chunk_frames=16)
    for i in range(0, len(audio), feed):
        rec.accept_waveform(audio[i:i + feed])
    # frames fully processed by whole chunks so far:
    hop, win = cfg.frontend.hop_length, cfg.frontend.n_fft
    n_chunks = (len(audio) - (win - hop)) // rec.chunk_samples
    n_frames = n_chunks * rec.chunk_frames
    want = _offline_tokens(cfg, model, params, audio, n_frames)
    assert rec.tokens == want


def test_streaming_finish_flushes(setup):
    cfg, model, params, audio = setup
    rec = StreamingRecognizer(model, params, cfg, chunk_frames=16)
    rec.accept_waveform(audio)
    rec.finish()
    assert isinstance(rec.tokens, list)
    rec.reset()
    assert rec.tokens == []


def test_streaming_beam_mode(setup):
    cfg, model, params, audio = setup
    rec = StreamingRecognizer(model, params, cfg, chunk_frames=16,
                              decoder="beam", beam=4)
    rec.accept_waveform(audio)
    toks = rec.tokens
    assert isinstance(toks, list)


def test_streaming_rnnt_mode(rng):
    """RNN-T streaming: chunked feed == one-shot rnnt greedy decode."""
    import dataclasses as dc

    from statecatcher_tpu.models.speech import build_speech_model
    from statecatcher_tpu.rnnt_decode import (
        rnnt_greedy_decode,
        rnnt_state_to_lists,
    )

    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "16",
        "--model.num_layers", "1", "--model.vocab_size", "8",
        "--model.rnnt_pred_emb_dim", "8", "--model.rnnt_joiner_dim", "8",
        "--train.mode", "rnnt",
        "--data.batch_samplerate", "8000",
    ])
    model = build_speech_model(cfg.model, 80, "rnnt")
    audio = rng.uniform(-0.5, 0.5, size=8000 * 2).astype(np.float32)
    feats = compute_features(jnp.asarray(audio[None]), cfg.frontend)
    prefix = jnp.zeros((1, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(3), feats,
                        init_carry(cfg.model, 1), None, prefix)
    params = jax.tree_util.tree_map(
        lambda v: jax.random.normal(jax.random.PRNGKey(1), v.shape) * 0.5
        if v.ndim == 2 else v, params,
    )

    rec = StreamingRecognizer(model, params, cfg, chunk_frames=16, decoder="rnnt")
    for i in range(0, len(audio), 1000):
        rec.accept_waveform(audio[i:i + 1000])
    got = rec.tokens

    # offline: same frames through encode + one-shot greedy
    hop, win = cfg.frontend.hop_length, cfg.frontend.n_fft
    n_chunks = (len(audio) - (win - hop)) // rec.chunk_samples
    n_frames = n_chunks * rec.chunk_frames
    enc_out, _ = model.apply(params, feats[:, :n_frames],
                             init_carry(cfg.model, 1), None, method="encode")
    enc_p = model.apply(params, enc_out.astype(jnp.float32),
                        method="rnnt_project_encoder")
    pred_table, join_kernel, join_bias = model.apply(
        params, method="rnnt_decode_tables")
    st = rnnt_greedy_decode(
        enc_p, pred_table.astype(jnp.float32),
        join_kernel.astype(jnp.float32), join_bias.astype(jnp.float32),
        jnp.asarray([n_frames]), blank_id=0,
    )
    want = rnnt_state_to_lists(st)[0]
    assert got == want
