#!/usr/bin/env python3
"""Standalone speed-of-light check for the fused RNN-T joint kernel.

Times ``joint_blank_emit`` forward and forward+backward at flagship shapes
(B=32, T=1598, U=128, J=64, V=1024, bf16 matmuls) and reports achieved MXU
TFLOP/s against the v5e peak — the evidence for BASELINE.md's RNN-T
roofline row (VERDICT round-2 item 4: "≥6000 audio-s/s or a roofline proof
it's bound").

FLOP accounting (padded shapes actually executed: Jp=128, U1p=136,
Vp=1024, Tp=T rounded to time_block):
  forward:   joint·K            2·B·Tp·U1p·Jp·Vp
  backward:  recompute joint·K  + dlog·Kᵀ + dK   → 3× the forward matmul
(the dj/denc/dpred reductions are Jp-wide, ~V/J≈8× smaller, counted too).

Run: python tools/profile_rnnt_joint.py [B T U J V]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from statecatcher_tpu.ops.rnnt_pallas import joint_blank_emit, _round_up

PEAK_BF16 = 197e12  # TPU v5e (v5 lite) chip peak, bf16


def main(argv):
    B, T, U, J, V = (int(x) for x in (argv + [32, 1598, 128, 64, 1024][len(argv):]))
    tb = 8
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((B, T, J)).astype(np.float32) * 0.1,
                      jnp.bfloat16)
    pred = jnp.asarray(rng.standard_normal((B, U + 1, J)).astype(np.float32) * 0.1,
                       jnp.bfloat16)
    kern = jnp.asarray(rng.standard_normal((J, V)).astype(np.float32) * 0.1,
                       jnp.bfloat16)
    bias = jnp.zeros((V,), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))

    Jp = _round_up(J + 1, 128)
    U1p = _round_up(U + 1, 8)
    Tp = _round_up(T, tb)
    Vp = _round_up(V, 128)
    mm = 2.0 * B * Tp * U1p * Jp * Vp          # one joint·K matmul pass
    small = 2.0 * B * Tp * U1p * Jp * Vp / (Vp / Jp)  # Jp-wide reductions

    fwd = jax.jit(lambda *a: joint_blank_emit(*a, blank_id=0, time_block=tb))

    def loss(e, p, k, b):
        bl, em = joint_blank_emit(e, p, k, b, labels, blank_id=0, time_block=tb)
        return jnp.sum(bl) + jnp.sum(em)

    fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    def bench(fn, args, n=4):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n

    t_f = bench(fwd, (enc, pred, kern, bias, labels))
    t_fb = bench(fwdbwd, (enc, pred, kern, bias))
    fl_f = mm + small
    fl_fb = 4 * mm + 3 * small      # fwd + recompute + dlog·Kᵀ + dK (+ small)
    print(f"shapes B={B} T={T} U={U} J={J} V={V}  padded Jp={Jp} U1p={U1p} Vp={Vp}")
    print(f"fwd      {t_f*1e3:8.2f} ms   {fl_f/t_f/1e12:6.1f} TF/s "
          f"({100*fl_f/t_f/PEAK_BF16:5.1f}% of bf16 peak)")
    print(f"fwd+bwd  {t_fb*1e3:8.2f} ms   {fl_fb/t_fb/1e12:6.1f} TF/s "
          f"({100*fl_fb/t_fb/PEAK_BF16:5.1f}% of bf16 peak)")


if __name__ == "__main__":
    main([int(x) for x in sys.argv[1:]] if len(sys.argv) > 1 else [])
