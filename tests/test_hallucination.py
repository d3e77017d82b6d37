"""Hallucination / bad-transcript filtering (VERDICT r4 missing #3 — the
reference's last roadmap item, reference README.md:30).

A recording whose transcript is garbage (mis-aligned VTT) shows a
per-utterance loss far above its peers; the filter z-scores losses against
a rolling median/MAD window, quarantines the recording's remaining
segments (row_valid=False), and reports through the dataset log endpoint.
"""

import os

import numpy as np
import pytest

from statecatcher_tpu.config import Config
from statecatcher_tpu.data.audio import write_wav_bytes
from statecatcher_tpu.metrics import LossOutlierDetector


def test_detector_flags_only_outliers(rng):
    det = LossOutlierDetector(zscore=4.0, window=64, min_window=16)
    vals = rng.normal(10.0, 0.5, 100)
    flags = [det.update(float(v)) for v in vals]
    assert not any(flags)                   # in-distribution: nothing flagged
    assert det.update(30.0) is True         # 40 sigma out
    assert det.flagged == 1
    # the outlier was NOT absorbed into the window: a repeat still flags
    assert det.update(30.0) is True
    # and normal values keep passing
    assert det.update(10.2) is False


def test_detector_needs_min_window():
    det = LossOutlierDetector(zscore=3.0, window=64, min_window=8)
    for _ in range(7):
        assert det.update(1.0) is False
    # window still below min: even a huge value passes (no stats yet)
    assert det.update(1000.0) is False
    assert det.flagged == 0


def test_detector_warmup_withholds_extremes(rng):
    """A bad recording present from step 0 must not poison the bootstrap
    window: extreme values are withheld (not flagged, not absorbed) even
    below min_window."""
    det = LossOutlierDetector(zscore=4.0, window=64, min_window=16)
    for v in rng.normal(10.0, 0.5, 8):
        det.update(float(v))
    assert det.update(500.0) is False          # warm-up: no flag...
    for v in rng.normal(10.0, 0.5, 8):
        det.update(float(v))
    # ...but it was withheld, so the stats stay clean and it flags now
    assert det.update(500.0) is True


def test_detector_relative_floor_on_homogeneous_batches():
    """Near-identical losses collapse the MAD, so harmless ~1 % deviations
    z-score as outliers; the relative-excess floor (vs the caller's scale)
    suppresses them while a real >10 % excess still flags."""
    det = LossOutlierDetector(zscore=6.0, window=64, min_window=8,
                              min_rel=0.05)
    for v in [0.01, -0.02, 0.015, -0.01, 0.02, -0.015, 0.01, -0.02, 0.0]:
        det.update(v, scale=120.0)
    assert det.update(1.5, scale=120.0) is False   # z huge, but only 1.25 %
    assert det.flagged == 0
    assert det.update(15.0, scale=120.0) is True   # 12.5 % excess: real


def test_detector_ignores_nonfinite():
    det = LossOutlierDetector(zscore=3.0, window=16, min_window=2)
    det.update(1.0)
    det.update(1.1)
    assert det.update(float("nan")) is False
    assert det.update(float("inf")) is False


GARBAGE = "the quick brown fox jumps over dogs"


def _write_fixtures(root, rng, garbage_row: bool):
    sr = 8000
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)   # same audio r0..r6 in both dirs
    n = 8 if garbage_row else 7
    for i in range(n):
        x = rng.uniform(-0.3, 0.3, 8 * sr).astype(np.float32)
        with open(os.path.join(root, f"r{i}.wav"), "wb") as f:
            f.write(write_wav_bytes(x, sr))
        if garbage_row and i == n - 1:
            # mis-aligned/hallucinated transcript: way more text than the
            # audio supports — per-utterance loss far above peers
            text = GARBAGE
        else:
            text = "ab"
        lines = ["WEBVTT", ""]
        for k in range(4):
            lines += [f"00:00:0{2*k}.000 --> 00:00:0{2*k+2}.000", text, ""]
        with open(os.path.join(root, f"r{i}.vtt"), "w") as f:
            f.write("\n".join(lines))
    if not garbage_row:
        # wav-less VTT: ignored by the dataset scan but seen by the
        # auto-trained char tokenizer, so both dirs share ONE vocab and the
        # loss scales are comparable
        with open(os.path.join(root, "vocab_only.vtt"), "w") as f:
            f.write("WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n"
                    f"{GARBAGE}\n")


def _run(root, zscore, extra=()):
    from statecatcher_tpu.train.loop import train

    cfg = Config().apply_overrides(list(extra) + [
        "--model.encoder", "lstm",
        "--model.hidden_size", "16",
        "--model.num_layers", "1",
        "--data.source", "local",
        "--data.local_dir", root,
        "--data.batch_samplerate", "8000",
        "--data.batch_size", "8",
        "--data.target_duration", "2.0",
        "--data.num_workers", "2",
        "--train.epochs", "6",
        "--train.optim.lr", "0.003",
        "--train.segments_per_dispatch", "1",
        "--train.hallucination_zscore", str(zscore),
        "--train.hallucination_min_window", "8",
        "--train.hallucination_window", "64",
        "--train.save_every_n_updates", "0",
    ])
    import tempfile

    with tempfile.TemporaryDirectory() as md:
        import dataclasses as dc

        cfg = dc.replace(cfg, train=dc.replace(cfg.train, model_dir=md,
                                               save_every_n_updates=None))
        return train(cfg)


def test_bad_transcript_detected_and_excluded(tmp_path, rng, caplog):
    """End-to-end: the mis-transcribed recording is flagged, its remaining
    segments stop training, and the post-quarantine losses match a run with
    the bad recording absent."""
    import logging

    root = str(tmp_path / "mixed")
    _write_fixtures(root, rng, garbage_row=True)
    with caplog.at_level(logging.WARNING, logger="statecatcher.train"):
        summary = _run(root, zscore=3.0)
    assert summary["hallucination_quarantined"] >= 1
    assert any("hallucination filter: quarantined" in r.message
               for r in caplog.records)

    # filter off: the garbage row keeps perturbing the batch-mean loss
    # (with the PyTorch length normalization its per-row value is LOW, so
    # the unfiltered mean is dragged down, not up)
    summary_off = _run(root, zscore=0.0)
    assert summary_off["hallucination_quarantined"] == 0

    # clean-only run (the bad recording absent entirely): after quarantine
    # the filtered run trains on exactly the same 7 rows, so its loss must
    # track the clean run far closer than the unfiltered run does
    clean_root = str(tmp_path / "clean")
    _write_fixtures(clean_root, rng, garbage_row=False)
    summary_clean = _run(clean_root, zscore=3.0)
    assert summary_clean["hallucination_quarantined"] == 0
    final_clean = summary_clean["loss_history"][-1]
    gap_filtered = abs(summary["loss_history"][-1] - final_clean)
    gap_unfiltered = abs(summary_off["loss_history"][-1] - final_clean)
    assert gap_filtered < gap_unfiltered / 2
    assert gap_filtered < 0.05 * final_clean   # within 5 % of the clean run


def test_mixed_length_recordings_not_falsely_flagged(tmp_path, rng):
    """Padding rows (recordings that ended under the 'padding' strategy)
    contribute silence + empty text at late segment indices; they must be
    EXCLUDED from the outlier statistics or the longest recording's tail
    segments get falsely quarantined against a collapsed silence median."""
    sr = 8000
    root = str(tmp_path / "mixed_len")
    os.makedirs(root)
    r = np.random.default_rng(0)
    for i in range(8):
        secs = 4 if i < 6 else 12          # two recordings run 3× longer
        x = r.uniform(-0.3, 0.3, secs * sr).astype(np.float32)
        with open(os.path.join(root, f"r{i}.wav"), "wb") as f:
            f.write(write_wav_bytes(x, sr))
        lines = ["WEBVTT", ""]
        for k in range(secs // 2):
            lines += [f"00:00:{2*k:02d}.000 --> 00:00:{2*k+2:02d}.000",
                      "ab", ""]
        with open(os.path.join(root, f"r{i}.vtt"), "w") as f:
            f.write("\n".join(lines))
    summary = _run(root, zscore=3.0,
                   extra=("--data.batch_segment_strategy", "padding"))
    assert summary["hallucination_quarantined"] == 0
