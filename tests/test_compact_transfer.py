"""Compact host→device transfer: int16 audio + prefix-length masks.

The train loop ships (K, B, S) int16 audio and (K, B) int32 lengths instead
of float32 audio + (K, B, S) bool masks (train/loop.py); the jitted step
de-quantizes and rebuilds the frame mask on device (train/step.py,
frontend.frame_mask_from_lens).  These tests pin the equivalence: identical
frame masks/lengths for prefix masks (bit-exact), and training within
float32 round-off for PCM-derived (int16-grid) audio.
"""

import numpy as np

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config
from statecatcher_tpu.frontend import compute_frame_mask, frame_mask_from_lens
from statecatcher_tpu.models.asr import init_carry
from statecatcher_tpu.models.speech import build_speech_model
from statecatcher_tpu.train.step import init_train_state, make_segment_scan_step


def test_frame_mask_from_lens_matches_compute_frame_mask(rng):
    for trial in range(20):
        B = int(rng.integers(1, 6))
        S = int(rng.integers(400, 4000))
        T = int(rng.integers(4, S // 80 + 5))
        stack = int(rng.choice([1, 2, 3]))
        lens = rng.integers(0, S + 1, size=B).astype(np.int32)
        mask = np.arange(S)[None, :] < lens[:, None]
        fm_a, il_a = compute_frame_mask(jnp.asarray(mask), T, stack)
        fm_b, il_b = frame_mask_from_lens(jnp.asarray(lens), S, T, stack)
        np.testing.assert_array_equal(np.asarray(fm_a), np.asarray(fm_b))
        np.testing.assert_array_equal(np.asarray(il_a), np.asarray(il_b))


def _cfg():
    return Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "32",
        "--model.num_layers", "1", "--model.vocab_size", "16",
        "--data.batch_size", "2", "--data.target_duration", "0.5",
        "--data.batch_samplerate", "8000",
    ])


def test_train_step_compact_inputs_match(rng):
    """i16 audio + lens through the segment-scan step == f32 + bool masks.

    The lens half is bit-exact (identical frame masks / in_lens / preds for
    identical features).  The audio half is within 1 ulp: XLA lowers the
    on-device /32767 to a reciprocal multiply (measured: 1536 of 65536 int16
    values differ in the last bit), so losses/params compare with tight
    tolerances rather than bitwise."""
    cfg = _cfg()
    B, K, S, U = 2, 2, 4000, 8
    model = build_speech_model(cfg.model, 80, "ctc")

    ints = rng.integers(-9000, 9000, (K, B, S)).astype(np.int16)
    audio_f32 = ints.astype(np.float32) / 32767.0
    lens = np.array([[3000, 4000], [2500, 0]], np.int32)
    mask = np.arange(S)[None, None, :] < lens[..., None]
    tokens = rng.integers(1, 16, (K, B, U)).astype(np.int32)
    tok_lens = np.full((K, B), 4, np.int32)
    row_valid = np.ones((K, B), bool)
    seg_valid = np.ones((K,), bool)

    def run(audio, m):
        state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 16)
        step = make_segment_scan_step(model, cfg, blank_id=0)
        carry = init_carry(cfg.model, B)
        state, carry, outs = step(
            state, carry, jnp.asarray(audio), jnp.asarray(m),
            jnp.asarray(tokens), jnp.asarray(tok_lens),
            jnp.asarray(row_valid), jnp.asarray(seg_valid),
        )
        return state, carry, outs

    s_a, c_a, o_a = run(audio_f32, mask)
    s_b, c_b, o_b = run(ints, lens)

    np.testing.assert_allclose(
        np.asarray(o_a.loss), np.asarray(o_b.loss), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(o_a.in_lens), np.asarray(o_b.in_lens))
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=2e-5,
        )
    for a, b in zip(jax.tree.leaves(c_a), jax.tree.leaves(c_b)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=2e-5,
        )


def test_train_loop_compact_vs_raw_loss_parity(tmp_path, rng):
    """Full train() with compact_transfer on vs off lands on the same loss
    sequence on WAV-fixture (PCM-derived) data."""
    from statecatcher_tpu.data.audio import write_wav_bytes
    from statecatcher_tpu.train.loop import train

    sr = 8000
    d = tmp_path / "fix"
    d.mkdir()
    for i in range(2):
        x = rng.uniform(-0.3, 0.3, size=2 * sr).astype(np.float32)
        (d / f"r{i}.wav").write_bytes(write_wav_bytes(x, sr))
        (d / f"r{i}.vtt").write_text(
            "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\nhello\n\n"
            "00:00:01.000 --> 00:00:02.000\nworld\n"
        )

    def run(compact):
        cfg = Config().apply_overrides([
            "--model.encoder", "lstm", "--model.hidden_size", "16",
            "--model.num_layers", "1",
            "--data.source", "local", "--data.local_dir", str(d),
            "--data.batch_samplerate", str(sr), "--data.batch_size", "2",
            "--data.target_duration", "1.0", "--data.num_workers", "1",
            "--train.steps", "4", "--train.segments_per_dispatch", "2",
            "--train.model_dir", str(tmp_path / f"m_{compact}"),
            "--train.compact_transfer", str(compact),
        ])
        return train(cfg)["loss_history"]

    np.testing.assert_allclose(run(True), run(False), rtol=1e-4, atol=1e-6)
