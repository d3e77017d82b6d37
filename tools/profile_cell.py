#!/usr/bin/env python3
"""On-chip shootout: one full LucyRNN layer (gate matmul + recurrence)
forward+backward at flagship shapes, per kernel_impl.

This measures the production composition — x → GateProj matmul → cell →
(h_all, h_T, s_T) consumed, grads w.r.t. (x, W, bias, h0, s0) — so the
numbers include the backward gate-matmul pair and every HBM pass the cell
machinery costs, directly comparable to BASELINE.md's round-3 gap table
(per segment-layer at B=64: fwd matmul ~2.1 ms + bwd pair ~7.9 ms + scan
kernels ~5.9 ms + adjoint fusions ~8.5 ms ≈ 24 ms for impl=pallas).

Timing: loop inside ONE jit (lax.fori_loop); the input x is perturbed by an
output-dependent 1e-30 scalar (no hoist/CSE) and every gradient is consumed
via sum(x²) (nonlinear → no dead-code narrowing).  The calib row prices the
consumer passes; subtract it from the variant rows.

Run: python tools/profile_cell.py [B T D] [impls...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from statecatcher_tpu.models.lucyrnn import lucy_cell_parallel

N_ITERS = 10


def sq(x):
    return jnp.sum(x.astype(jnp.float32) ** 2)


def timed(body, ops):
    @jax.jit
    def run(ops):
        return lax.fori_loop(0, N_ITERS, lambda i, a: body(a, ops),
                             jnp.float32(0.0))
    float(run(ops))
    t0 = time.perf_counter()
    float(run(ops))
    return (time.perf_counter() - t0) / N_ITERS


def main(argv):
    nums = [a for a in argv if a.isdigit()]
    impls = [a for a in argv if not a.isdigit()] or [
        "pallas", "fused-lm@64", "fused-lm@128", "fused-lm@256"]
    B, T, D = (int(v) for v in (nums + [64, 1598, 512][len(nums):]))
    rng = np.random.default_rng(0)
    ops = {
        "x": jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.bfloat16),
        "w": jnp.asarray(rng.standard_normal((D, 7 * D)) * 0.05, jnp.bfloat16),
        "bias": jnp.asarray(rng.standard_normal((7 * D,)) * 0.3, jnp.float32),
        "h0": jnp.asarray(rng.standard_normal((B, D)) * 0.1, jnp.bfloat16),
        "s0": jnp.asarray(rng.standard_normal((B, D)) * 0.1, jnp.bfloat16),
        "wout": jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.bfloat16),
    }

    def report(name, t):
        print(f"{name:28s} {t*1e3:8.3f} ms/layer-seg", flush=True)

    # calib: the consumer passes alone (read x for sq + pert + read wout-ish)
    report("calib consumers", timed(
        lambda a, o: sq(o["x"] + (a * 1e-30).astype(jnp.bfloat16))
        + sq(o["wout"]), ops))

    for impl in impls:
        def layer(x, w, bias, h0, s0, wout, impl=impl):
            gates = jnp.dot(x, w)
            h_all, h_T, s_T = lucy_cell_parallel(
                gates, h0, s0, impl=impl, bias=bias)
            return sq(h_all * wout.astype(h_all.dtype)) + sq(h_T) + sq(s_T)

        def fwd_body(a, o, impl=impl):
            xi = o["x"] + (a * 1e-30).astype(jnp.bfloat16)
            return layer(xi, o["w"], o["bias"], o["h0"], o["s0"], o["wout"])

        def bwd_body(a, o, impl=impl):
            xi = o["x"] + (a * 1e-30).astype(jnp.bfloat16)
            val, grads = jax.value_and_grad(layer, argnums=(0, 1, 2, 3, 4))(
                xi, o["w"], o["bias"], o["h0"], o["s0"], o["wout"])
            return val + sum(sq(g) for g in grads)

        try:
            report(f"{impl} fwd", timed(fwd_body, ops))
            report(f"{impl} fwd+bwd", timed(bwd_body, ops))
        except Exception as e:
            print(f"{impl} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    # correctness anchor on-chip: fused-lm vs pallas forward
    try:
        ga = jnp.dot(ops["x"], ops["w"])
        h_ref, _, s_ref = lucy_cell_parallel(
            ga, ops["h0"], ops["s0"], impl="pallas", bias=ops["bias"])
        h_lm, _, s_lm = lucy_cell_parallel(
            ga, ops["h0"], ops["s0"], impl="fused-lm@128", bias=ops["bias"])
        err = float(jnp.max(jnp.abs(h_ref.astype(jnp.float32)
                                    - h_lm.astype(jnp.float32))))
        print(f"fused-lm vs pallas fwd max abs err: {err:.3e}")
    except Exception as e:
        print(f"on-chip parity FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
