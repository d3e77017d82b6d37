#!/usr/bin/env python3
"""Breakdown profiling for the RNN-T loss path on the real chip.

Isolates, at flagship shapes (B=32, T=1598, U=128, J=64, V=1024):

  * joint  — chunked blank/emit computation (remat) fwd+bwd, DP replaced by a sum
  * dp     — lattice DP fwd+bwd on precomputed blank/emit tables
  * fused  — the full rnnt_loss_fused fwd+bwd
  * per time_chunk sweep

Run: python tools/profile_rnnt.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from statecatcher_tpu.ops import rnnt as R


def timeit(fn, args, n=3, name=""):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # force fetch (axon tunnel)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return dt


def main():
    B, T, U, J, V = 32, 1598, 128, 64, 1024
    U1 = U + 1
    rng = np.random.default_rng(0)
    dt_act = jnp.bfloat16

    enc_p = jnp.asarray(rng.standard_normal((B, T, J)), dt_act)
    pred_p = jnp.asarray(rng.standard_normal((B, U1, J)), dt_act)
    jk = jnp.asarray(rng.standard_normal((J, V)) * 0.05, jnp.float32)
    jb = jnp.zeros((V,), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.full((B,), T, jnp.int32)
    u_lens = jnp.full((B,), U, jnp.int32)

    blank = jnp.asarray(rng.standard_normal((B, T, U1)) - 2.0, jnp.float32)
    emit = jnp.asarray(rng.standard_normal((B, T, U)) - 2.0, jnp.float32)

    # --- DP only: fwd ---
    dp_fwd = jax.jit(lambda b, e: jnp.mean(R.rnnt_nll_from_blank_emit(b, e, t_lens, u_lens)))
    timeit(dp_fwd, (blank, emit), name="dp fwd")

    # --- DP only: fwd+bwd ---
    dp_vg = jax.jit(jax.value_and_grad(
        lambda b, e: jnp.mean(R.rnnt_nll_from_blank_emit(b, e, t_lens, u_lens)),
        argnums=(0, 1)))
    timeit(dp_vg, (blank, emit), name="dp fwd+bwd")

    # --- joint only (chunked remat, DP replaced by sum) ---
    for tc in (16, 32, 64, 128):
        def joint_loss(ep, pp, k, b, tc=tc):
            # replicate rnnt_loss_fused's chunk structure, skip the DP
            Bx, Tx, Jx = ep.shape
            pad_t = (-Tx) % tc
            if pad_t:
                ep = jnp.pad(ep, ((0, 0), (0, pad_t), (0, 0)))
            n_chunks = (Tx + pad_t) // tc

            @jax.checkpoint
            def chunk_be(enc_chunk):
                joint = jnp.tanh(enc_chunk[:, :, None, :] + pp[:, None, :, :])
                logits = (joint @ k.astype(joint.dtype) + b.astype(joint.dtype)).astype(jnp.float32)
                log_z = jax.nn.logsumexp(logits, axis=-1)
                blank_lp = logits[..., 0] - log_z
                lbl = jnp.broadcast_to(labels[:, None, :, None], (Bx, enc_chunk.shape[1], U, 1))
                emit_lp = jnp.take_along_axis(logits[:, :, :U, :], lbl, axis=3)[..., 0] - log_z[:, :, :U]
                return blank_lp, emit_lp

            chunks = ep.reshape(Bx, n_chunks, tc, Jx)
            _, (bc, ec) = jax.lax.scan(lambda c, x: (None, chunk_be(x)), None,
                                       jnp.swapaxes(chunks, 0, 1))
            return jnp.sum(bc) * 1e-6 + jnp.sum(ec) * 1e-6

        jl = jax.jit(jax.value_and_grad(joint_loss, argnums=(0, 1, 2, 3)))
        timeit(jl, (enc_p, pred_p, jk, jb), name=f"joint fwd+bwd tc={tc}")

    # --- full fused loss fwd+bwd at time_chunk sweep ---
    for tc in (16, 32, 64, 128):
        f = jax.jit(jax.value_and_grad(
            lambda ep, pp, k, b, tc=tc: R.rnnt_loss_fused(
                ep, pp, k, b, labels, t_lens, u_lens, time_chunk=tc),
            argnums=(0, 1, 2, 3)))
        timeit(f, (enc_p, pred_p, jk, jb), name=f"fused fwd+bwd tc={tc}")

    # segment audio-seconds for context: B*16s = 512 audio-sec per segment
    print("context: one 16s segment batch = %d audio-sec" % (B * 16))


if __name__ == "__main__" and "pallas" not in sys.argv:
    main()

def profile_pallas():
    import statecatcher_tpu.ops.rnnt_pallas as RP
    B, T, U, J, V = 32, 1598, 128, 64, 1024
    U1 = U + 1
    rng = np.random.default_rng(0)
    enc_p = jnp.asarray(rng.standard_normal((B, T, J)), jnp.bfloat16)
    pred_p = jnp.asarray(rng.standard_normal((B, U1, J)), jnp.bfloat16)
    jk = jnp.asarray(rng.standard_normal((J, V)) * 0.05, jnp.float32)
    jb = jnp.zeros((V,), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.full((B,), T, jnp.int32)
    u_lens = jnp.full((B,), U, jnp.int32)

    for tb in (8, 16, 32):
        f = jax.jit(lambda e, p, k, b, tb=tb: RP.joint_blank_emit(e, p, k, b, labels, time_block=tb))
        timeit(f, (enc_p, pred_p, jk, jb), name=f"pallas joint fwd tb={tb}")
        g = jax.jit(jax.value_and_grad(
            lambda e, p, k, b, tb=tb: RP.rnnt_loss_pallas(
                e, p, k, b, labels, t_lens, u_lens, time_block=tb),
            argnums=(0, 1, 2, 3)))
        timeit(g, (enc_p, pred_p, jk, jb), name=f"pallas loss fwd+bwd tb={tb}")


if __name__ == "__main__" and "pallas" in sys.argv:
    profile_pallas()
