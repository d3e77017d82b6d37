"""L1 data plane: HTTP client, VTT parsing, audio decode, chunking, prefetch.

Behavior-parity layer with the reference's dataset.py / parse_vtts.py — WER
parity depends on byte-identical segmentation, so the chunking and masking
semantics here match the reference exactly (covered by fixture tests).
"""

from statecatcher_tpu.data.vtt import parse_timestamp, vtt_to_segments_with_text
from statecatcher_tpu.data.chunking import group_cues_into_chunks, chunks_to_segments
from statecatcher_tpu.data.client import SpeechDataset
from statecatcher_tpu.data.local import LocalSpeechDataset

__all__ = [
    "parse_timestamp",
    "vtt_to_segments_with_text",
    "group_cues_into_chunks",
    "chunks_to_segments",
    "SpeechDataset",
    "LocalSpeechDataset",
]
