#!/usr/bin/env python3
"""Streaming latency: per-chunk wall latency of the StreamingRecognizer on
the real chip (VERDICT r3 item 7 — the README's design goal is streaming,
so the latency story needs a number).

Feeds 320 ms chunks (32 × 10 ms frames) of synthetic audio to the flagship
model (LucyRNN-CTC 512×4, vocab 1024, fused-lm kernel) and reports p50/p95
per-chunk latency after a warm-up chunk, for greedy and prefix-beam decode.
Latency includes the host→device→host round trip (what a serving process
would see; on this box that includes the axon tunnel hop).

Run: python tools/profile_streaming.py [n_chunks]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from statecatcher_tpu.config import Config
from statecatcher_tpu.models.speech import build_speech_model
from statecatcher_tpu.streaming import StreamingRecognizer


def main(argv):
    n_chunks = int(argv[0]) if argv else 50
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn",
        "--model.hidden_size", "512",
        "--model.num_layers", "4",
        "--model.vocab_size", "1024",
        "--model.dtype", "bfloat16",
    ])
    fdim = 80
    model = build_speech_model(cfg.model, fdim, "ctc")
    rng = np.random.default_rng(0)
    sr = cfg.frontend.sample_rate
    hop = cfg.frontend.hop_length
    chunk_frames = 32
    chunk_samples = chunk_frames * hop            # 320 ms at 10 ms hop

    import jax.numpy as jnp
    from statecatcher_tpu.frontend import compute_features
    from statecatcher_tpu.models.asr import init_carry

    dummy = jnp.zeros((1, chunk_samples + cfg.frontend.n_fft), jnp.float32)
    feats = compute_features(dummy, cfg.frontend)
    params = model.init(jax.random.PRNGKey(0), feats,
                        init_carry(cfg.model, 1, jnp.bfloat16))

    for decoder in ("greedy", "beam"):
        rec = StreamingRecognizer(model, params, cfg, decoder=decoder)
        lat = []
        for i in range(n_chunks + 3):
            audio = rng.uniform(-0.3, 0.3, chunk_samples).astype(np.float32)
            t0 = time.perf_counter()
            rec.accept_waveform(audio)
            _ = rec.tokens  # forces decode state to host
            dt = time.perf_counter() - t0
            if i >= 3:  # skip compile + warm-up chunks
                lat.append(dt * 1e3)
        lat = np.asarray(lat)
        print(f"{decoder:6s} chunk=320ms  p50 {np.percentile(lat, 50):7.2f} ms  "
              f"p95 {np.percentile(lat, 95):7.2f} ms  "
              f"mean {lat.mean():7.2f} ms  (n={len(lat)}); "
              f"RTF {np.percentile(lat, 50) / 320:.3f}", flush=True)

        # per-term breakdown (VERDICT r4 weak #5): encoder-only dispatch,
        # full fused step dispatch, and the host-side state pull, each
        # measured as its own round trip at the streaming shapes
        audio_j = jnp.asarray(
            rng.uniform(-0.3, 0.3, chunk_samples + cfg.frontend.n_fft
                        - cfg.frontend.hop_length).astype(np.float32)[None])
        carry = rec._carry

        def _ms(fn, n=20):
            fn()
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            return (time.perf_counter() - t0) / n * 1e3

        enc_ms = _ms(lambda: np.asarray(
            rec._encode_chunk(params, audio_j, carry)[0]))
        if decoder == "beam":
            st = rec._beam_state
            step_ms = _ms(lambda: np.asarray(
                rec._step_chunk(params, audio_j, carry, st)[1]))
            pull_ms = _ms(lambda: rec.tokens)
        else:
            step_ms = _ms(lambda: np.asarray(
                rec._step_chunk(params, audio_j, carry)[0]))
            pull_ms = 0.0
        print(f"       breakdown: encoder+lp dispatch {enc_ms:6.2f} ms | "
              f"fused encode+decode dispatch {step_ms:6.2f} ms | "
              f"state pull {pull_ms:5.2f} ms", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
