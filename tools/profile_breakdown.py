"""On-device component breakdown of the flagship train step (B=32).

Times each component by running it N times inside ONE jit via lax.fori_loop
with a forced data dependency between iterations (a scalar derived from the
previous output is folded into the next input), so the measurement pays the
axon-tunnel dispatch cost exactly once per component.  Usage:

    python tools/profile_breakdown.py            # all components
    PROF_SCAN=pallas-dual python tools/profile_breakdown.py enc
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.frontend import compute_features, compute_frame_mask
from statecatcher_tpu.ops.ctc import ctc_loss_per_example

B = int(os.environ.get("PROF_B", "32"))
N = int(os.environ.get("PROF_N", "20"))
sec = 16.0; sr = 16000; S = int(sr * sec)
impl = os.environ.get("PROF_SCAN", "auto")
ctc_impl = os.environ.get("PROF_CTC", "pallas")
cfg = Config().apply_overrides([
    "--model.encoder", "lucyrnn", "--model.hidden_size", "512",
    "--model.num_layers", "4", "--model.vocab_size", "1024",
    "--model.dtype", "bfloat16", "--model.lucyrnn.kernel_impl", impl,
    "--data.batch_size", str(B), "--data.target_duration", str(sec),
])
model = build_model(cfg.model, 80)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.uniform(-0.3, 0.3, (B, S)).astype(np.float32))
smask = jnp.ones((B, S), jnp.bool_)
U = 128
tokens = jnp.asarray(rng.integers(1, 1024, (B, U)).astype(np.int32))
tok_lens = jnp.full((B,), U, jnp.int32)
carry = init_carry(cfg.model, B, jnp.bfloat16)
feats = jax.jit(lambda a: compute_features(a, cfg.frontend))(audio)
T = feats.shape[1]
fm, in_lens = compute_frame_mask(smask, T)
in_lens = jnp.maximum(in_lens, 1)
params = model.init(jax.random.PRNGKey(0), feats, carry)
lp32 = jax.jit(
    lambda: model.apply(params, feats, carry, fm)[0].astype(jnp.float32)
)()


def timeit_inloop(name, body, n=N):
    """body(eps: scalar) -> scalar; runs n times inside one jit."""

    @jax.jit
    def run():
        def step(i, acc):
            return acc + body(acc * 1e-30)

        return jax.lax.fori_loop(0, n, step, 0.0)

    run()  # compile + warm
    float(run())  # one full timed dispatch to prime caches
    t0 = time.perf_counter()
    float(run())
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "frontend"):
    timeit_inloop(
        "frontend",
        lambda eps: jnp.sum(
            compute_features(audio + eps, cfg.frontend).astype(jnp.float32)
        ) * 1e-9,
    )

if which in ("all", "enc"):
    timeit_inloop(
        f"enc[{impl}] fwd",
        lambda eps: jnp.sum(
            model.apply(params, feats + eps.astype(feats.dtype), carry, fm)[0]
            .astype(jnp.float32)
        ) * 1e-9,
    )

    def enc_bwd(eps):
        g = jax.grad(
            lambda f: jnp.sum(
                model.apply(params, f, carry, fm)[0].astype(jnp.float32) ** 2
            ) * 1e-6
        )(feats + eps.astype(feats.dtype))
        return jnp.sum(g.astype(jnp.float32)) * 1e-9

    timeit_inloop(f"enc[{impl}] fwd+bwd(feats)", enc_bwd)

    def enc_bwd_params(eps):
        g = jax.grad(
            lambda p: jnp.sum(
                model.apply(p, feats + eps.astype(feats.dtype), carry, fm)[0]
                .astype(jnp.float32) ** 2
            ) * 1e-6
        )(params)
        return jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)) * 1e-9

    timeit_inloop(f"enc[{impl}] fwd+bwd(params)", enc_bwd_params)

if which in ("all", "ctc"):
    for ci in (ctc_impl, "optax"):
        def ctc_bwd(eps, ci=ci):
            g = jax.grad(
                lambda lg: jnp.mean(
                    ctc_loss_per_example(lg, in_lens, tokens, tok_lens, impl=ci)
                )
            )(lp32 + eps)
            return jnp.sum(g) * 1e-9

        timeit_inloop(f"ctc[{ci}] fwd+bwd", ctc_bwd)
