#!/usr/bin/env python3
"""Microbenchmark: the backward gate-matmul pair at flagship shapes.

The round-3 gap table (BASELINE.md) leaves ONE open roofline term: the
backward gate matmuls (L1-3) at ~50 % of MXU peak — 189 ms of the 686 ms
device step.  This tool measures, standalone on the real chip, every
candidate formulation of the two backward products

  wgrad:  dW = x^T · dy     contract over B·T = 102272 rows → (512, 3584)
  dgrad:  dx = dy · W^T     (BT, 3584) × (3584, 512)

so the round-4 fix (custom VJP wiring the winning formulation into
GateProj) rests on measured numbers, not guesses.

Timing: the measured loop runs INSIDE one jit (lax.fori_loop).  Each
iteration consumes the FULL output via sum(out²) (nonlinear → XLA cannot
narrow the dot to the consumed slice — a plain [0,0] consumer gets
rewritten to a dot-product and measures nothing) and feeds that scalar
back into a 1e-30-scaled perturbation of one operand (→ the dot is not
loop-invariant, no hoist/CSE).  Overhead per iteration: one elementwise
pass over the perturbed operand + one read of the output; quoted per
variant group below.

Run: python tools/profile_wgrad.py [BT Din Dout]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PEAK_BF16 = 197e12
N_ITERS = 20


def pert(arr, acc):
    return arr + (acc * 1e-30).astype(arr.dtype)


def sq(out):
    return jnp.sum(out.astype(jnp.float32) ** 2)


def timed(body, ops):
    """body(acc, ops) -> acc (a scalar consuming the full output)."""
    @jax.jit
    def run(ops):
        return lax.fori_loop(0, N_ITERS, lambda i, a: body(a, ops),
                             jnp.float32(0.0))
    float(run(ops))  # compile + warm
    t0 = time.perf_counter()
    float(run(ops))
    return (time.perf_counter() - t0) / N_ITERS


def wgrad_pallas(x, dy, kc=256, j_tile=0):
    """Pallas wgrad: f32 accumulation directly in the VMEM-resident out block,
    grid innermost over K chunks (out index_map constant in k → the block
    persists in VMEM across the k steps)."""
    BT, Din = x.shape
    Dout = dy.shape[1]
    nk = BT // kc

    if j_tile:
        def kernel(x_ref, dy_ref, out_ref):
            @pl.when(pl.program_id(1) == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:] += lax.dot_general(
                x_ref[:], dy_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Din, Dout), jnp.float32),
            grid=(Dout // j_tile, nk),
            in_specs=[
                pl.BlockSpec((kc, Din), lambda j, k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kc, j_tile), lambda j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Din, j_tile), lambda j, k: (0, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, dy)

    def kernel(x_ref, dy_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += lax.dot_general(
            x_ref[:], dy_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Din, Dout), jnp.float32),
        grid=(nk,),
        in_specs=[
            pl.BlockSpec((kc, Din), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, Dout), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Din, Dout), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, dy)


def main(argv):
    BT, Din, Dout = (int(v) for v in (argv + [102272, 512, 3584][len(argv):]))
    rng = np.random.default_rng(0)
    ops = {
        "x": jnp.asarray(rng.standard_normal((BT, Din)).astype(np.float32) * 0.1,
                         jnp.bfloat16),
        "dy": jnp.asarray(rng.standard_normal((BT, Dout)).astype(np.float32) * 0.1,
                          jnp.bfloat16),
        "w": jnp.asarray(rng.standard_normal((Din, Dout)).astype(np.float32) * 0.1,
                         jnp.bfloat16),
    }
    fl = 2.0 * BT * Din * Dout

    def report(name, t, nflops=fl):
        print(f"{name:42s} {t*1e3:8.3f} ms  {nflops/t/1e12:6.1f} TF/s "
              f"({100*nflops/t/PEAK_BF16:5.1f}% peak)", flush=True)

    # --- harness-overhead calibration (subtract from the rows below):
    # consume(out) = one HBM read of out; pert(x) = one read+write of x.
    report("calib sq(dy) read-only  (no matmul)", timed(
        lambda a, o: sq(pert(o["dy"], a)), ops))
    report("calib sq(x) + pert(x)   (no matmul)", timed(
        lambda a, o: sq(pert(o["x"], a)), ops))

    # --- in-graph-shaped variants: 3-D operands, contract (B,T) ----------
    Bb = 64
    Tt = BT // Bb
    x3 = ops["x"].reshape(Bb, Tt, Din)
    dy3 = ops["dy"].reshape(Bb, Tt, Dout)
    ops3 = dict(ops, x3=x3, dy3=dy3)
    report("wgrad 3D contract (B,T) f32", timed(
        lambda a, o: sq(lax.dot_general(
            pert(o["x3"], a), o["dy3"], (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)), ops3))
    def pair3(a, o):
        xi = pert(o["x3"], a)
        dw = lax.dot_general(xi, o["dy3"], (((0, 1), (0, 1)), ((), ())),
                             preferred_element_type=jnp.float32)
        dx = lax.dot_general(o["dy3"], pert(o["w"], a), (((2,), (1,)), ((), ())))
        return sq(dw) + sq(dx)
    report("bwd pair 3D (in-graph shapes)", timed(pair3, ops3), 2 * fl)

    # --- references (perturb w: ~free; consume = 1 read of the big out) ---
    report("fwd  x@w -> bf16", timed(
        lambda a, o: sq(jnp.dot(o["x"], pert(o["w"], a))), ops))
    report("dgrad dy@w.T -> bf16", timed(
        lambda a, o: sq(lax.dot_general(
            o["dy"], pert(o["w"], a), (((1,), (1,)), ((), ())))), ops))

    # --- wgrad variants (perturb x: +~0.26 ms, identical across them) -----
    report("wgrad plain dot_general -> f32", timed(
        lambda a, o: sq(lax.dot_general(
            pert(o["x"], a), o["dy"], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)), ops))
    report("wgrad plain -> bf16 out", timed(
        lambda a, o: sq(lax.dot_general(
            pert(o["x"], a), o["dy"], (((0,), (0,)), ((), ())))), ops))
    for k in (8,):
        def split(a, o, k=k):
            xs = pert(o["x"], a).reshape(k, BT // k, Din)
            ds = o["dy"].reshape(k, BT // k, Dout)
            p = lax.dot_general(xs, ds, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
            return sq(jnp.sum(p, axis=0))
        report(f"wgrad split-K k={k} (batched+sum) f32", timed(split, ops))

    report("wgrad via explicit x.T matmul f32", timed(
        lambda a, o: sq(lax.dot_general(
            pert(o["x"], a).T, o["dy"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)), ops))

    # both backward products together (the real in-graph pair)
    def pair(a, o):
        xi = pert(o["x"], a)
        dw = lax.dot_general(xi, o["dy"], (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        dx = lax.dot_general(o["dy"], pert(o["w"], a), (((1,), (1,)), ((), ())))
        return sq(dw) + sq(dx)
    report("bwd pair (wgrad+dgrad) XLA", timed(pair, ops), 2 * fl)

    # --- Pallas wgrad (BT padded up so larger K-chunks divide evenly) -----
    BTp = -(-BT // 1024) * 1024
    opsp = dict(ops,
                xp=jnp.pad(ops["x"], ((0, BTp - BT), (0, 0))),
                dyp=jnp.pad(ops["dy"], ((0, BTp - BT), (0, 0))))
    for kc in (128, 256, 512):
        try:
            f = functools.partial(wgrad_pallas, kc=kc)
            report(f"wgrad pallas kc={kc} full-N (BTp)", timed(
                lambda a, o, f=f: sq(f(pert(o["xp"], a), o["dyp"])), opsp))
        except Exception as e:
            print(f"wgrad pallas kc={kc} FAILED: {type(e).__name__}: {e}",
                  flush=True)
    for (kc, jt) in ((256, 512), (512, 512), (512, 1792), (1024, 896)):
        try:
            f = functools.partial(wgrad_pallas, kc=kc, j_tile=jt)
            report(f"wgrad pallas kc={kc} j_tile={jt} (BTp)", timed(
                lambda a, o, f=f: sq(f(pert(o["xp"], a), o["dyp"])), opsp))
        except Exception as e:
            print(f"wgrad pallas kc={kc} j={jt} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    # correctness of the pallas kernel vs XLA (small shapes)
    xs = ops["x"][:2048]
    dys = ops["dy"][:2048]
    ref = lax.dot_general(xs.astype(jnp.float32), dys.astype(jnp.float32),
                          (((0,), (0,)), ((), ())))
    for kw in ({"kc": 256}, {"kc": 256, "j_tile": 512}):
        got = wgrad_pallas(xs, dys, **kw)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f"pallas wgrad {kw} rel err vs f32 XLA: {err:.2e}")


if __name__ == "__main__":
    main(sys.argv[1:])
