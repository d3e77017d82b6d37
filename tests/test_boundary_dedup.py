"""Decode-side segment-boundary dedup (VERDICT round-2 item 7).

The cue grouping duplicates a kept boundary cue into the next chunk
(reference dataset.py:179-211 parity — chunking.group_cues_into_chunks), so
consecutive segments overlap in audio and repeat the cue's text.  These tests
pin the metadata (chunking.segment_meta) and the decode-layer dedup
(decode.boundary_trimmed_lens / dedup_reference_text) that remove the
boundary artifact from evaluation without touching training segmentation.
"""

import numpy as np

from statecatcher_tpu.data.chunking import (
    group_cues_into_chunks,
    preprocess_recording,
    segment_meta,
)
from statecatcher_tpu.decode import boundary_trimmed_lens, dedup_reference_text


def _fixture_cues():
    # Three 1.24 s cues back to back — the fixture_wer shape.  window=2.0:
    # chunk1 = [cue1, cue2] (2.48 s raw, trimmed to 2.0), cue2 duplicated as
    # the seed of chunk2.
    return [
        (0.0, 1.24, "alpha bravo charlie"),
        (1.24, 2.48, "delta echo foxtrot"),
        (2.48, 3.72, "golf hotel india"),
    ]


def test_segment_meta_marks_duplicated_boundary_cue():
    chunks = group_cues_into_chunks(_fixture_cues(), 2.0)
    assert chunks[0][2] == ["alpha bravo charlie", "delta echo foxtrot"]
    assert chunks[1][2][0] == "delta echo foxtrot"  # duplicated seed cue
    meta = segment_meta(chunks, 2.0)
    # chunk 0: raw end 2.48 trimmed at start+2.0; next chunk starts inside it
    assert meta[0]["start"] == 0.0
    assert abs(meta[0]["end"] - 2.0) < 1e-9
    assert abs(meta[0]["overlap_start"] - 1.24) < 1e-9
    assert meta[0]["dup_first_text"] is None
    # chunk 1 re-contains cue2 in full → its text must be dropped once when
    # joining the recording-level reference
    assert meta[1]["dup_first_text"] == "delta echo foxtrot"


def test_segment_meta_no_overlap_when_chunks_disjoint():
    cues = [(0.0, 1.0, "a"), (1.0, 1.9, "b"), (2.5, 3.4, "c")]
    chunks = group_cues_into_chunks(cues, 2.0)
    meta = segment_meta(chunks, 2.0)
    for m in meta:
        assert m["overlap_start"] is None
        assert m["dup_first_text"] is None


def test_boundary_trimmed_lens_caps_at_overlap():
    sr, hop = 16000, 160
    # 2 s segment → 200 frames at 10 ms hop; overlap starts at 1.24 s
    metas = [
        {"start": 0.0, "end": 2.0, "overlap_start": 1.24, "dup_first_text": None},
        None,                       # dataset without metadata: untouched
        {"start": 2.0, "end": 4.0, "overlap_start": None, "dup_first_text": None},
    ]
    in_lens = np.array([200, 200, 180], np.int32)
    out = boundary_trimmed_lens(in_lens, metas, sr, hop, stack_order=1)
    # 1.24 s × 100 frames/s + the 2-frame CTC emission-latency margin
    assert out[0] == 126
    assert out[1] == 200 and out[2] == 180
    # margin knob off → the raw overlap cut
    out0 = boundary_trimmed_lens(in_lens, metas, sr, hop, stack_order=1,
                                 latency_margin_frames=0)
    assert out0[0] == 124
    # stack_order folds frames
    out2 = boundary_trimmed_lens(in_lens, metas, sr, hop, stack_order=2,
                                 latency_margin_frames=0)
    assert out2[0] == 62
    # the margin never extends past the true segment length
    short = boundary_trimmed_lens(np.array([124], np.int32), metas[:1], sr, hop)
    assert short[0] == 124


def test_dedup_reference_text():
    meta = {"dup_first_text": "delta echo foxtrot"}
    assert dedup_reference_text("delta echo foxtrot golf hotel", meta) == "golf hotel"
    assert dedup_reference_text("delta echo foxtrot", meta) == ""
    assert dedup_reference_text("unrelated words", meta) == "unrelated words"
    assert dedup_reference_text("anything", None) == "anything"
    assert dedup_reference_text("anything", {"dup_first_text": None}) == "anything"


def test_preprocess_recording_returns_meta():
    sr = 1000
    audio = np.zeros(4000, np.float32)
    vtt = "\n".join([
        "WEBVTT", "",
        "00:00.000 --> 00:01.240", "alpha bravo charlie", "",
        "00:01.240 --> 00:02.480", "delta echo foxtrot", "",
        "00:02.480 --> 00:03.720", "golf hotel india", "",
    ])
    arrays, texts, masks, meta = preprocess_recording(audio, vtt, sr, 2 * sr)
    assert len(meta) == len(arrays)
    assert meta[0]["overlap_start"] is not None
    assert meta[1]["dup_first_text"] == "delta echo foxtrot"
