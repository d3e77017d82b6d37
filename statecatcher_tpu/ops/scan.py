"""First-order linear recurrence  s_t = a_t · s_{t-1} + b_t  over time.

This is the core primitive of every recurrent encoder here:
  * LucyRNN state:   s_t = decay_t · s_{t-1} + alpha_t · kv_t
  * LucyRNN output:  h_t = z_t · h_{t-1} + (1 − z_t) · c_t
  * mLSTM normalizer/denominator recurrences (chunk-level)
  * diagonal pieces of the LSTM when expressed in scan form

The reference computes these with per-(b,d) sequential Triton loops
(reference lucyrnn_triton.py:158-244) with **no backward pass** (outputs
written outside autograd — SURVEY.md Appendix A.1).  Here the recurrence is
associative-scan parallelized (Blelloch over T on the VPU; O(log T) depth)
and fully differentiable — JAX autodiff of an associative scan is itself a
pair of associative scans, so the backward is parallel-in-time too.

All functions operate on arrays shaped (B, T, D) with time on axis 1, and
are elementwise in D — which is why hidden-dim sharding of the recurrent
encoders needs no per-step collectives (SURVEY.md §2.3 TP row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _combine(x, y):
    """Compose two affine maps  s ↦ a·s + b  (y after x)."""
    a1, b1 = x
    a2, b2 = y
    return a2 * a1, a2 * b1 + b2


def linear_scan_assoc(a: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray) -> jnp.ndarray:
    """Parallel-in-time scan.  a, b: (B, T, D); s0: (B, D) → s: (B, T, D)."""
    a_cum, b_cum = lax.associative_scan(_combine, (a, b), axis=1)
    # Fold in the initial state: s_t = a_{1..t}·s0 + (scan of b)
    return b_cum + a_cum * s0[:, None, :]


def linear_scan_seq(a: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray) -> jnp.ndarray:
    """Sequential ``lax.scan`` reference (bitwise-faithful recurrence order)."""

    def step(s, ab):
        a_t, b_t = ab
        s_new = a_t * s + b_t
        return s_new, s_new

    # scan over time: move T to leading axis
    aT = jnp.swapaxes(a, 0, 1)
    bT = jnp.swapaxes(b, 0, 1)
    _, sT = lax.scan(step, s0, (aT, bT))
    return jnp.swapaxes(sT, 0, 1)


def linear_scan_chunked(
    a: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray, chunk: int = 16
) -> jnp.ndarray:
    """Chunk-vectorized scan: sequential depth = chunk + T/chunk.

    Time is tiled (T → NC × C); the intra-chunk recurrence runs as C unrolled
    steps each operating on the full (B, NC, D) slab (VPU stays busy across
    chunks), then the NC chunk carries are combined with a short associative
    scan and broadcast back.  Fewer memory passes than the O(log T) Blelchoch
    form of ``associative_scan`` — this is also the schedule the Pallas kernel
    uses on-chip.
    """
    B, T, D = a.shape
    C = min(chunk, T)
    pad = (-T) % C
    if pad:
        # identity elements: a=1, b=0 leave the state unchanged
        a = jnp.concatenate([a, jnp.ones((B, pad, D), a.dtype)], axis=1)
        b = jnp.concatenate([b, jnp.zeros((B, pad, D), b.dtype)], axis=1)
    Tp = T + pad
    NC = Tp // C
    a_c = a.reshape(B, NC, C, D)
    b_c = b.reshape(B, NC, C, D)

    # Intra-chunk scan, vectorized over (B, NC): C unrolled steps.
    def step(carry, ab):
        A, S = carry          # A: running ∏a within chunk, S: running local scan
        a_t, b_t = ab
        S = a_t * S + b_t
        A = a_t * A
        return (A, S), (A, S)

    ones = jnp.ones((B, NC, D), a.dtype)
    zeros = jnp.zeros((B, NC, D), b.dtype)
    (_, _), (A_run, S_run) = lax.scan(
        step, (ones, zeros),
        (jnp.moveaxis(a_c, 2, 0), jnp.moveaxis(b_c, 2, 0)),
        unroll=True,
    )
    # A_run/S_run: (C, B, NC, D) — prefix products/scans within each chunk
    A_chunk = A_run[-1]       # (B, NC, D) total chunk decay
    S_chunk = S_run[-1]       # (B, NC, D) chunk-local scan result

    # Combine chunk carries with a short scan over NC.
    s_end = linear_scan_assoc(A_chunk, S_chunk, s0)     # (B, NC, D): state at chunk ends
    s_before = jnp.concatenate(
        [s0[:, None, :], s_end[:, :-1, :]], axis=1
    )                                                   # (B, NC, D)

    # Broadcast: s_t = S_local + A_localprefix · s_before_chunk
    out = jnp.moveaxis(S_run, 0, 2) + jnp.moveaxis(A_run, 0, 2) * s_before[:, :, None, :]
    out = out.reshape(B, Tp, D)
    return out[:, :T]


def linear_scan(a, b, s0, impl: str = "auto") -> jnp.ndarray:
    if impl == "auto":
        # pallas on TPU (fastest measured, fast compile); associative scan
        # elsewhere (pallas would need interpret mode off-TPU)
        impl = "pallas" if jax.default_backend() == "tpu" else "assoc"
    if impl == "assoc":
        return linear_scan_assoc(a, b, s0)
    if impl == "chunked":
        return linear_scan_chunked(a, b, s0)
    if impl == "xla-scan":
        return linear_scan_seq(a, b, s0)
    if impl == "pallas":
        from statecatcher_tpu.ops.lucy_pallas import linear_scan_pallas

        return linear_scan_pallas(a, b, s0)
    if impl == "sp":
        from statecatcher_tpu.ops.scan_sp import linear_scan_sp

        return linear_scan_sp(a, b, s0)
    raise ValueError(f"Unknown scan impl {impl!r}")
