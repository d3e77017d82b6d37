"""Sequence-parallel linear scan: the time axis sharded across devices.

The optional context-parallel extension from SURVEY.md §2.3: when one
segment's T doesn't fit (or one wants more chips per utterance), shard T
across a mesh axis.  The recurrence carry between time-shards is only
O(B·D) — each device computes its local inclusive scan plus its total
affine map (A_tot, S_tot), the per-device maps are exchanged with ONE small
``all_gather`` over the axis (rides ICI), every device folds its exclusive
prefix locally, and applies it to its shard.  Total cross-chip traffic:
P·B·D·2 floats per scan — negligible next to the activations.

Composition rule (affine maps s ↦ A·s + S):
    incoming(p) = fold_{j<p} (A_j, S_j) applied to s0
    out_t       = S_local_t + A_localprefix_t · incoming(p)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from statecatcher_tpu.ops.scan import linear_scan_assoc


def _local_scan_block(a, b, s0, axis_name: str):
    """Runs on each device's (B, T_local, D) shard inside shard_map."""
    B, Tl, D = a.shape
    zeros = jnp.zeros((B, D), a.dtype)
    S_loc = linear_scan_assoc(a, b, zeros)          # local scan from empty state
    A_cum = jnp.cumprod(a, axis=1)                  # local prefix decay products
    A_tot = A_cum[:, -1]
    S_tot = S_loc[:, -1]

    idx = lax.axis_index(axis_name)
    Pn = lax.axis_size(axis_name)
    allA = lax.all_gather(A_tot, axis_name)         # (P, B, D) — tiny, ICI
    allS = lax.all_gather(S_tot, axis_name)

    def fold(j, s):
        return jnp.where(j < idx, allA[j] * s + allS[j], s)

    # s0 is replicated; the fold result varies per device (depends on idx) —
    # mark the carry as axis-varying so the loop types line up.
    s0_v = jax.lax.pvary(s0, (axis_name,)) if hasattr(jax.lax, "pvary") else s0
    s_in = lax.fori_loop(0, Pn, fold, s0_v)         # exclusive prefix ∘ s0
    return S_loc + A_cum * s_in[:, None, :]


def linear_scan_time_sharded(
    a: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray,
    mesh: Mesh, axis_name: str = "data",
) -> jnp.ndarray:
    """s_t = a_t·s_{t-1} + b_t with T sharded over ``axis_name`` of ``mesh``.

    a, b: (B, T, D) with T divisible by the axis size; s0: (B, D) replicated.
    Returns the full scan, sharded the same way as the inputs.
    """
    from jax.experimental.shard_map import shard_map

    spec_t = P(None, axis_name, None)
    spec_r = P()
    fn = shard_map(
        lambda a_, b_, s0_: _local_scan_block(a_, b_, s0_, axis_name),
        mesh=mesh,
        in_specs=(spec_t, spec_t, spec_r),
        out_specs=spec_t,
    )
    return fn(a, b, s0)
