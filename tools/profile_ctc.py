"""CTC impl shootout at flagship shapes: optax vs lattice vs pallas, plus a
component breakdown of the pallas path (prep gather / transposes / alpha
kernel / beta+grad) to locate where the time goes.  Run on the TPU host."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from statecatcher_tpu.ops.ctc import ctc_loss_per_example
from statecatcher_tpu.ops import ctc_pallas as cp

B = int(os.environ.get("PROF_B", "32"))
T = int(os.environ.get("PROF_T", "1601"))
V = int(os.environ.get("PROF_V", "1024"))
U = int(os.environ.get("PROF_U", "128"))

rng = np.random.default_rng(0)
logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
tokens = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
tok_lens = jnp.full((B,), U, jnp.int32)
in_lens = jnp.full((B,), T, jnp.int32)


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:7.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return out


for ci in ("optax", "lattice", "pallas"):
    f = jax.jit(lambda lg, ci=ci: jnp.mean(ctc_loss_per_example(lg, in_lens, tokens, tok_lens, impl=ci)))
    timeit(f"ctc-{ci} fwd     ", f, logits)
    g = jax.jit(jax.grad(lambda lg, ci=ci: jnp.mean(ctc_loss_per_example(lg, in_lens, tokens, tok_lens, impl=ci))))
    timeit(f"ctc-{ci} fwd+bwd ", g, logits)

print("--- pallas component breakdown ---", flush=True)
log_probs = jax.jit(lambda lg: jax.nn.log_softmax(lg, axis=-1))(logits)
jax.block_until_ready(log_probs)

timeit("  log_softmax      ", jax.jit(lambda lg: jax.nn.log_softmax(lg, axis=-1)), logits)
prep = jax.jit(lambda lp: cp._prep(lp, in_lens, tokens, 0)[2])
emit = timeit("  prep (gather)    ", prep, log_probs)
timeit("  alpha kernel e2e ", jax.jit(lambda e: cp._alpha_all(e, cp._prep(log_probs, in_lens, tokens, 0)[1], in_lens)), emit)

ext, allow_skip, emit2, S = cp._prep(log_probs, in_lens, tokens, 0)
alpha = cp._alpha_all(emit2, allow_skip, in_lens)
jax.block_until_ready(alpha)
timeit("  beta kernel e2e  ", jax.jit(lambda e: cp._beta_all(e, allow_skip, in_lens, tok_lens)), emit2)
beta = cp._beta_all(emit2, allow_skip, in_lens, tok_lens)
jax.block_until_ready(beta)


def grad_proj(alpha, beta, emit, log_probs):
    log_z = -cp._nll_from_alpha(alpha, in_lens, tok_lens)
    gamma = jnp.exp(jnp.clip(alpha + beta - emit - log_z[:, None, None], -80.0, 80.0))
    onehot = jax.nn.one_hot(ext, log_probs.shape[2], dtype=gamma.dtype)
    return -jnp.einsum("bts,bsv->btv", gamma, onehot)


timeit("  grad projection  ", jax.jit(grad_proj), alpha, beta, emit2, log_probs)
