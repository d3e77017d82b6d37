import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from statecatcher_tpu.ops.scan import linear_scan_assoc, linear_scan_chunked, linear_scan_seq
from statecatcher_tpu.ops.lucy_pallas import linear_scan_pallas

B,T,D = 8, 1598, 512
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(0.5,1.0,(B,T,D)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((B,T,D)).astype(np.float32))
s0 = jnp.zeros((B,D), jnp.float32)
w = jnp.asarray(rng.standard_normal((B,T,D)).astype(np.float32))

impls = {
    "assoc": linear_scan_assoc,
    "chunked": linear_scan_chunked,
    "pallas": linear_scan_pallas,
}

def fetch(x):
    return float(jnp.sum(x))  # force real completion through the tunnel

for name, fn in impls.items():
    f = jax.jit(lambda a,b,s0,fn=fn: fn(a,b,s0))
    g = jax.jit(jax.grad(lambda a,b,s0,fn=fn: jnp.sum(fn(a,b,s0)*w), argnums=(0,1)))
    try:
        out = f(a,b,s0); fetch(out)
        t0=time.perf_counter()
        for _ in range(10):
            out = f(a,b,s0); fetch(out)
        print(f"{name} fwd: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
        go = g(a,b,s0); fetch(go[0])
        t0=time.perf_counter()
        for _ in range(10):
            go = g(a,b,s0); fetch(go[0])
        print(f"{name} fwd+bwd: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

# correctness spot check on TPU
ref = linear_scan_seq(a[:, :256], b[:, :256], s0)
for name, fn in impls.items():
    got = fn(a[:, :256], b[:, :256], s0)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"{name} max err vs seq: {err:.2e}", flush=True)
