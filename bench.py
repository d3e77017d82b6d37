#!/usr/bin/env python3
"""Benchmark: train audio-seconds/s/chip, LucyRNN-CTC stateful (north star).

Runs the full jitted train step (frontend → encoder → loss → backward →
update, carry threaded) on synthetic 16 s segments and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "audio_sec_per_sec_per_chip",
     "vs_baseline": N}

``BENCH_MODES=sweep`` instead emits one JSON line per recorded per-mode
config (lucyrnn-ctc flagship, xlstm-ctc, rnnt U=64, lstm-ctc) so the
driver's BENCH artifact captures the per-mode records reproducibly.

Default batch is 96 — the measured round-4 sweet spot (13487 vs 12872 at
B=64 and 13310 at B=128); the full bench incl. compile stays inside the
driver's time budget.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the recorded first-round value in BENCH_BASELINE.json when
present (ratio > 1 = faster than our own round-1 baseline), else 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_one(B=64, K=8, n_disp=2, seconds=16.0, kernel="", ctc_impl="auto",
            dtype="bfloat16", encoder="lucyrnn", mode="ctc", U=128,
            xlstm_kernel="", xlstm_chunk="", rnnt_tb="", rnnt_band="",
            xlstm_remat=""):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from statecatcher_tpu.config import Config
    from statecatcher_tpu.models.asr import init_carry
    from statecatcher_tpu.models.speech import build_speech_model
    from statecatcher_tpu.train.step import init_train_state, make_segment_scan_step

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
    if xlstm_kernel:
        over += ["--model.xlstm.kernel_impl", xlstm_kernel]
    if xlstm_chunk:
        over += ["--model.xlstm.chunk_size", xlstm_chunk]
    if xlstm_remat:
        over += ["--model.xlstm.ffn_remat", xlstm_remat]
    if rnnt_tb:
        over += ["--train.rnnt_time_block", rnnt_tb]
    if rnnt_band:
        over += ["--train.rnnt_band", rnnt_band]
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
    }), flush=True)


def main():
    env = os.environ.get
    base = dict(
        B=int(env("BENCH_BATCH", "96")),
        K=int(env("BENCH_SEGMENTS", "24")),
        n_disp=int(env("BENCH_DISPATCHES", "1")),
        seconds=float(env("BENCH_SECONDS", "16.0")),
        kernel=env("BENCH_KERNEL", ""),          # "" = config default
        ctc_impl=env("BENCH_CTC", "auto"),       # auto = pallas on TPU
        dtype=env("BENCH_DTYPE", "bfloat16"),
        encoder=env("BENCH_ENCODER", "lucyrnn"),  # lucyrnn|lstm|xlstm|rwkv
        mode=env("BENCH_MODE", "ctc"),            # ctc|rnnt
        U=int(env("BENCH_RNNT_U", "128")),
        xlstm_kernel=env("BENCH_XLSTM_KERNEL", ""),
        xlstm_chunk=env("BENCH_XLSTM_CHUNK", ""),
        xlstm_remat=env("BENCH_XLSTM_REMAT", ""),
        rnnt_tb=env("BENCH_RNNT_TIME_BLOCK", ""),
        rnnt_band=env("BENCH_RNNT_BAND", ""),
    )
    if env("BENCH_MODES", "") == "sweep":
        # per-mode records (BASELINE.md round-3 table), one JSON line each
        for spec in (
            dict(base, encoder="lucyrnn", mode="ctc"),
            # xLSTM record config: fused lane-major kernel at chunk 256
            # (auto default is 128; 256 is the measured best: 9638 vs
            # 9526 — BASELINE.md round 5), B=64 (K follows the base
            # default: 24 measured 9854 vs 9742 at 16)
            dict(base, encoder="xlstm", mode="ctc", B=64, n_disp=2,
                 xlstm_chunk="256"),
            dict(base, encoder="lucyrnn", mode="rnnt", U=64),
            # U=128 long-label row: exercises the auto band selection
            # (train.rnnt_band=-1 default → band 32 at padded U > 48,
            # i.e. from the 64 bucket on — the U=64 row above is banded too)
            dict(base, encoder="lucyrnn", mode="rnnt", U=128),
            dict(base, encoder="lstm", mode="ctc"),
        ):
            try:
                run_one(**spec)
            except Exception as e:
                print(json.dumps({
                    "metric": f"{spec['encoder']}_{spec['mode']}",
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }), flush=True)
        return
    run_one(**base)


if __name__ == "__main__":
    main()
