#!/usr/bin/env python3
"""Benchmark: train audio-seconds/s/chip, LucyRNN-CTC stateful (north star).

Runs the full jitted train step (frontend → LucyRNN encoder → CTC loss →
backward → update, carry threaded) on synthetic 16 s segments and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "audio_sec_per_sec_per_chip",
     "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the recorded first-round value in BENCH_BASELINE.json when
present (ratio > 1 = faster than our own round-1 baseline), else 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from statecatcher_tpu.config import Config
    from statecatcher_tpu.models.asr import init_carry
    from statecatcher_tpu.models.speech import build_speech_model
    from statecatcher_tpu.train.step import init_train_state, make_segment_scan_step

    # Flagship config: canonical hyperparameters (SURVEY.md Appendix B):
    # hidden 512 × 4 layers, vocab 1024, 16 s segments @ 16 kHz, MFCC-80.
    # The measured unit is the production dispatch: a K-segment on-device
    # scan with carry threaded and one optimizer update per segment.
    # B=64 is the recorded best config (BASELINE.md); full bench run incl.
    # compile stays under 2 min on the chip, inside the driver's budget.
    B = int(os.environ.get("BENCH_BATCH", "64"))
    K = int(os.environ.get("BENCH_SEGMENTS", "8"))
    n_disp = int(os.environ.get("BENCH_DISPATCHES", "2"))
    seconds = float(os.environ.get("BENCH_SECONDS", "16.0"))
    kernel = os.environ.get("BENCH_KERNEL", "")  # "" = config default
    ctc_impl = os.environ.get("BENCH_CTC", "auto")  # auto = pallas on TPU
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    encoder = os.environ.get("BENCH_ENCODER", "lucyrnn")  # lucyrnn|lstm|xlstm|rwkv
    mode = os.environ.get("BENCH_MODE", "ctc")            # ctc|rnnt

    over = [
        "--train.mode", mode,
        "--model.encoder", encoder,
        "--model.hidden_size", "512",
        "--model.num_layers", "4",
        "--model.xlstm.embedding_dim", "512",
        "--model.vocab_size", "1024",
        "--model.dtype", dtype,
        "--data.batch_size", str(B),
        "--data.target_duration", str(seconds),
    ]
    if kernel:
        over += ["--model.lucyrnn.kernel_impl", kernel]
    xlstm_kernel = os.environ.get("BENCH_XLSTM_KERNEL", "")
    if xlstm_kernel:
        over += ["--model.xlstm.kernel_impl", xlstm_kernel]
    xlstm_chunk = os.environ.get("BENCH_XLSTM_CHUNK", "")
    if xlstm_chunk:
        over += ["--model.xlstm.chunk_size", xlstm_chunk]
    rnnt_tb = os.environ.get("BENCH_RNNT_TIME_BLOCK", "")
    if rnnt_tb:
        over += ["--train.rnnt_time_block", rnnt_tb]
    rnnt_u = os.environ.get("BENCH_RNNT_U", "")
    cfg = Config().apply_overrides(over)

    sr = cfg.data.batch_samplerate
    S = int(sr * seconds)
    fdim = 80
    model = build_speech_model(cfg.model, fdim, mode)

    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, fdim, 64)
    train_step = make_segment_scan_step(model, cfg, blank_id=0, ctc_impl=ctc_impl)

    rng_np = np.random.default_rng(0)
    audio = jnp.asarray(rng_np.uniform(-0.3, 0.3, (K, B, S)).astype(np.float32))
    mask = jnp.ones((K, B, S), jnp.bool_)
    U = int(rnnt_u) if rnnt_u else 128
    tokens = jnp.asarray(rng_np.integers(1, 1024, (K, B, U)).astype(np.int32))
    tok_lens = jnp.full((K, B), U, jnp.int32)
    row_valid = jnp.ones((K, B), jnp.bool_)
    seg_valid = jnp.ones((K,), jnp.bool_)
    carry = init_carry(cfg.model, B, jnp.dtype(cfg.model.dtype))

    # Warmup (compile) + steady state timing.  Each dispatch ends with an
    # actual host fetch of a value derived from the new state — on the axon
    # tunnel, block_until_ready alone does not reliably wait.
    def fetch(outs, carry):
        return float(jnp.sum(outs.loss)) + float(
            jnp.sum(jax.tree.leaves(carry)[0][0, 0])
        )

    state, carry, outs = train_step(
        state, carry, audio, mask, tokens, tok_lens, row_valid, seg_valid
    )
    fetch(outs, carry)

    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, carry, outs = train_step(
            state, carry, audio, mask, tokens, tok_lens, row_valid, seg_valid
        )
        fetch(outs, carry)
    dt = time.perf_counter() - t0

    audio_sec_per_sec = B * seconds * K * n_disp / dt

    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        try:
            baseline = json.load(open(base_path)).get("value")
        except Exception:
            baseline = None
    vs = (audio_sec_per_sec / baseline) if baseline else 1.0

    # Speed-of-light context (statecatcher_tpu/roofline.py): matmul MFU and
    # % of the overlapped compute/memory roofline for this config.
    from statecatcher_tpu.roofline import train_step_roofline

    rl = train_step_roofline(cfg, fdim, U, mode)
    print(json.dumps({
        "metric": f"train_audio_seconds_per_second_per_chip_{encoder}_{mode}_stateful",
        "value": round(audio_sec_per_sec, 2),
        "unit": "audio_sec/s/chip",
        "vs_baseline": round(vs, 3),
        "mfu": round(rl.mfu(audio_sec_per_sec), 4),
        "pct_speed_of_light": round(100 * rl.pct_sol(audio_sec_per_sec), 2),
    }))


if __name__ == "__main__":
    main()
