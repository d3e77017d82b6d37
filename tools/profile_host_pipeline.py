#!/usr/bin/env python3
"""Host data-plane throughput vs chip consumption (VERDICT r4 weak #4).

The chip consumes ~15.2k audio-seconds/second at the flagship config
(BASELINE.md round 5); the host must decode + chunk + tokenize + stack that
much audio per wall-second to keep it fed.  The reference needed a
32-process spawn pool for exactly this stage (reference train.py:662-670).
This bench measures what OUR host path actually delivers:

  * per-stage single-thread rates (audio-s/s/core):
      decode_audio (RIFF parse, native C++ when available)
      preprocess_recording (VTT parse + cue grouping + fixed-size segments)
      tokenizer.encode (char and unigram-1024 w/ native Viterbi)
      host_prep (group stacking + int16 quantization + prefix lens —
        runs on the LOOP thread, overlapped with device compute)
  * the harmonic full-chain per-core rate and the implied core count to
    feed the flagship chip rate
  * the threaded BatchPipeline aggregate on this box (GIL contention and
    all), via LocalSpeechDataset

Run: PYTHONPATH=. python tools/profile_host_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from statecatcher_tpu.data.audio import (
    decode_audio,
    decode_audio_fast,
    write_wav_bytes,
)
from statecatcher_tpu.data.chunking import preprocess_recording
from statecatcher_tpu.data.pipeline import BatchPipeline, stack_segment_slice
from statecatcher_tpu.tokenizer.char import CharTokenizer
from statecatcher_tpu.tokenizer.unigram import UnigramTokenizer

SR = 16000
REC_SEC = 600.0            # one synthetic 10-minute podcast recording
TARGET_SEC = 16.0          # flagship segment length
FLAGSHIP_RATE = 15217.0    # audio-s/s/chip, BASELINE.md round 5

WORDS = (
    "the of and to in is was he for it with as his on be at by had this "
    "are but from or have an they which one you were all her she there "
    "would their we him been has when who will more no if out so said what"
).split()


def make_recording(rng):
    audio = rng.uniform(-0.3, 0.3, int(REC_SEC * SR)).astype(np.float32)
    wav = write_wav_bytes(audio, SR)
    cues = []
    t = 0.0
    while t < REC_SEC - 5.0:
        text = " ".join(rng.choice(WORDS, 12))
        cues.append(
            f"{_ts(t)} --> {_ts(t + 4.8)}\n{text}\n"
        )
        t += 5.0
    vtt = "WEBVTT\n\n" + "\n".join(cues)
    return audio, wav, vtt


def _ts(sec):
    h, rem = divmod(sec, 3600)
    m, s = divmod(rem, 60)
    return f"{int(h):02d}:{int(m):02d}:{s:06.3f}"


def timed_rate(fn, audio_sec_per_call, min_time=2.0):
    """Run fn repeatedly for >= min_time; return audio-s/s."""
    fn()                                   # warm (allocators, caches)
    n, t0 = 0, time.perf_counter()
    while True:
        fn()
        n += 1
        dt = time.perf_counter() - t0
        if dt >= min_time:
            return n * audio_sec_per_call / dt


def main():
    rng = np.random.default_rng(0)
    audio, wav, vtt = make_recording(rng)
    target = int(TARGET_SEC * SR)
    results = {}

    # --- stage 1: WAV decode -------------------------------------------- #
    results["decode_audio"] = timed_rate(
        lambda: decode_audio(wav, SR), REC_SEC)
    results["decode_audio_pcm16_passthrough"] = timed_rate(
        lambda: decode_audio_fast(wav, SR), REC_SEC)

    # --- stage 2: VTT + chunking + fixed-size segments ------------------ #
    results["preprocess_recording"] = timed_rate(
        lambda: preprocess_recording(audio, vtt, SR, target), REC_SEC)

    arrays, texts, masks, meta = preprocess_recording(audio, vtt, SR, target)

    # --- stage 3: tokenizer encode -------------------------------------- #
    char_tok = CharTokenizer.train(texts)
    results["tokenize_char"] = timed_rate(
        lambda: [char_tok.encode(t) for t in texts], REC_SEC)
    uni_tok = UnigramTokenizer.train(texts * 4, vocab_size=1024)
    results["tokenize_unigram1024"] = timed_rate(
        lambda: [uni_tok.encode(t) for t in texts], REC_SEC)

    # --- stage 4: host_prep (loop-thread stacking + quantization) ------- #
    # emulate train/loop.py host_prep for a K-segment group: stack rows,
    # int16-quantize, prefix lens, token padding
    K = min(16, len(arrays))
    rows = 8

    def host_prep():
        g_audio, g_mask, g_tok = [], [], []
        for si in range(K):
            a = np.stack([arrays[si]] * rows)
            m = np.stack([masks[si]] * rows)
            g_tok.append([char_tok.encode(texts[si])] * rows)
            g_audio.append(a)
            g_mask.append(m)
        audio_k = np.stack(g_audio)
        mask_k = np.stack(g_mask)
        q = np.clip(np.rint(audio_k * 32767.0), -32768.0, 32767.0).astype(np.int16)
        lens = np.count_nonzero(mask_k, axis=2).astype(np.int32)
        U = max(max(len(t) for seg in g_tok for t in seg), 1)
        U = -(-U // 16) * 16
        tokens = np.zeros((K, rows, U), np.int32)
        for gi, seg in enumerate(g_tok):
            for bi, t in enumerate(seg):
                tokens[gi, bi, : len(t)] = t
        return q, lens, tokens

    results["host_prep"] = timed_rate(host_prep, K * rows * TARGET_SEC)

    # int16-passthrough host_prep (compact transfer default): stack stays
    # int16 and the quantize pass disappears entirely
    arrays16 = [(a * 32767).astype(np.int16) for a in arrays]

    def host_prep_pcm16():
        g_audio, g_mask, g_tok = [], [], []
        for si in range(K):
            g_audio.append(np.stack([arrays16[si]] * rows))
            g_mask.append(np.stack([masks[si]] * rows))
            g_tok.append([char_tok.encode(texts[si])] * rows)
        audio_k = np.stack(g_audio)
        mask_k = np.stack(g_mask)
        lens = np.count_nonzero(mask_k, axis=2).astype(np.int32)
        U = max(max(len(t) for seg in g_tok for t in seg), 1)
        U = -(-U // 16) * 16
        tokens = np.zeros((K, rows, U), np.int32)
        for gi, seg in enumerate(g_tok):
            for bi, t in enumerate(seg):
                tokens[gi, bi, : len(t)] = t
        return audio_k, lens, tokens

    results["host_prep_pcm16"] = timed_rate(
        host_prep_pcm16, K * rows * TARGET_SEC)

    # --- full chain per core (harmonic over the per-item stages; host_prep
    # runs once per group on the loop thread, overlapped with the device) -- #
    per_item = [
        "decode_audio_pcm16_passthrough", "preprocess_recording",
        "tokenize_char",
    ]
    chain = 1.0 / sum(1.0 / results[s] for s in per_item)
    results["full_chain_per_core"] = chain
    results["implied_cores_for_flagship"] = FLAGSHIP_RATE / chain

    # --- aggregate: the real threaded pipeline on this box --------------- #
    from statecatcher_tpu.data.local import LocalSpeechDataset

    with tempfile.TemporaryDirectory() as d:
        n_rec = 4
        for i in range(n_rec):
            open(os.path.join(d, f"r{i}.wav"), "wb").write(wav)
            open(os.path.join(d, f"r{i}.vtt"), "w").write(vtt)
        ds = LocalSpeechDataset(d, batch_samplerate=SR)
        ds.start_session(batch_size=n_rec, order="asc")
        pipe = BatchPipeline(ds, target, num_workers=16)
        try:
            pipe.next_batch()              # warm
            t0 = time.perf_counter()
            n_batches = 3
            tot_audio = 0.0
            for _ in range(n_batches):
                b = pipe.next_batch()
                tot_audio += sum(
                    float(m.sum()) / SR for ms in b.mask_items for m in ms
                )
                # include the per-segment stacking the consumer pays
                Kb = b.num_segments("padding")
                for si in range(min(Kb, 40)):
                    stack_segment_slice(b, si, target)
                ds.mark_batch_done(b.epoch, b.batch_id)
            dt = time.perf_counter() - t0
            results["pipeline_aggregate_this_box"] = tot_audio / dt
        finally:
            pipe.stop()
            ds.end_session()

    results["ncores_this_box"] = os.cpu_count()
    results["flagship_chip_rate"] = FLAGSHIP_RATE
    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 1)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
