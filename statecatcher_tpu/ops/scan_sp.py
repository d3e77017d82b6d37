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

import contextlib
import threading

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from statecatcher_tpu.ops.scan import linear_scan_assoc

# Active (mesh, axis_name) for kernel_impl="sp" scans.  Set by the train-step
# builder (train/step.py) around tracing; read by linear_scan(impl="sp") at
# trace time, so the flax cell needs no mesh plumbing.
_ACTIVE = threading.local()


@contextlib.contextmanager
def sequence_parallel_scans(mesh: Mesh, axis_name: str = "model"):
    """Activate time-sharded scans for ``kernel_impl="sp"`` within the block."""
    prev = getattr(_ACTIVE, "ctx", None)
    _ACTIVE.ctx = (mesh, axis_name)
    try:
        yield
    finally:
        _ACTIVE.ctx = prev


def linear_scan_sp(a: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray) -> jnp.ndarray:
    """``linear_scan`` impl="sp" entry: time axis sharded over the active
    mesh axis (see ``sequence_parallel_scans``).  Pads T to a multiple of the
    axis size with identity steps (a=1, b=0)."""
    ctx = getattr(_ACTIVE, "ctx", None)
    if ctx is None:
        raise RuntimeError(
            "kernel_impl='sp' needs an active sequence_parallel_scans(mesh) "
            "context — enable mesh.sequence_parallel in the train config, or "
            "wrap the call site"
        )
    mesh, axis_name = ctx
    Pn = mesh.shape[axis_name]
    B, T, D = a.shape
    pad = (-T) % Pn
    if pad:
        a = jnp.concatenate([a, jnp.ones((B, pad, D), a.dtype)], axis=1)
        b = jnp.concatenate([b, jnp.zeros((B, pad, D), b.dtype)], axis=1)
    out = linear_scan_time_sharded(a, b, s0, mesh, axis_name)
    return out[:, :T]


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

    # Ring token pass (neighbor ppermute over ICI, fully differentiable):
    # device p's incoming carry is fixed at step p, computed from its left
    # neighbor's incoming carry and that neighbor's total affine map.
    perm = [(i, (i + 1) % Pn) for i in range(Pn)]
    s_in = s0
    for k in range(Pn - 1):
        out_val = A_tot * s_in + S_tot
        recv = lax.ppermute(out_val, axis_name, perm)
        s_in = jnp.where(idx == k + 1, recv, s_in)
    return S_loc + A_cum * s_in[:, None, :]


def linear_scan_time_sharded(
    a: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray,
    mesh: Mesh, axis_name: str = "data",
) -> jnp.ndarray:
    """s_t = a_t·s_{t-1} + b_t with T sharded over ``axis_name`` of ``mesh``.

    a, b: (B, T, D) with T divisible by the axis size; s0: (B, D) replicated.
    Returns the full scan, sharded the same way as the inputs.
    """
    # Keep the batch dim on its own mesh axis through the shard_map boundary.
    # With in_spec P(None, axis, None) the partitioner must REPLICATE the
    # batch-sharded activations over 'data' first (XLA: "Involuntary full
    # rematerialization" — a full-tensor HBM round-trip per scan); with
    # P('data', axis, None) entering the region splits only time, which is a
    # local slice (each 'model'-axis device already holds the full T).
    batch_axis = None
    for cand in mesh.axis_names:
        if cand != axis_name and mesh.shape[cand] > 1 and a.shape[0] % mesh.shape[cand] == 0:
            batch_axis = cand
            break
    spec_t = P(batch_axis, axis_name, None)
    spec_s = P(batch_axis, None)
    fn = jax.shard_map(
        lambda a_, b_, s0_: _local_scan_block(a_, b_, s0_, axis_name),
        mesh=mesh,
        in_specs=(spec_t, spec_t, spec_s),
        out_specs=spec_t,
        # the replicated s0's cotangent is axis-varying (summed at the
        # boundary); disable the static varying-manual-axes checker to allow it
        check_vma=False,
    )
    return fn(a, b, s0)
