import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.frontend import compute_features, compute_frame_mask
from statecatcher_tpu.ops.ctc import ctc_loss_per_example
from statecatcher_tpu.decode import ctc_greedy_decode

B=32; sec=16.0; sr=16000; S=int(sr*sec)
cfg = Config().apply_overrides(["--model.encoder","lucyrnn","--model.hidden_size","512","--model.num_layers","4","--model.vocab_size","1024","--model.dtype","bfloat16","--data.batch_size",str(B),"--data.target_duration",str(sec)])
model = build_model(cfg.model, 80)
rng=np.random.default_rng(0)
audio = jnp.asarray(rng.uniform(-0.3,0.3,(B,S)).astype(np.float32))
smask = jnp.ones((B,S),jnp.bool_)
U=128
tokens = jnp.asarray(rng.integers(1,1024,(B,U)).astype(np.int32))
tok_lens = jnp.full((B,),U,jnp.int32)
carry = init_carry(cfg.model, B, jnp.bfloat16)
feats = jax.jit(lambda a: compute_features(a, cfg.frontend))(audio)
T = feats.shape[1]
fm, in_lens = compute_frame_mask(smask, T)
in_lens = jnp.maximum(in_lens,1)
params = model.init(jax.random.PRNGKey(0), feats, carry)

# time via in-jit repetition (tunnel-safe): run the target N times chained on dummy dependency
def timeit_chained(name, mk_fn, n=8):
    # mk_fn(x) -> y must map compatible shapes so we can chain
    f = jax.jit(mk_fn)
    out = f(); s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0=time.perf_counter()
    for _ in range(n):
        out = f()
        s += float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt=(time.perf_counter()-t0)/n*1000
    print(f"{name}: {dt:.1f} ms (incl ~dispatch overhead)", flush=True)

timeit_chained("enc fwd", lambda: model.apply(params, feats, carry, fm)[0])
def encg():
    g = jax.grad(lambda p: jnp.sum(model.apply(p, feats, carry, fm)[0].astype(jnp.float32)**2)*1e-6)(params)
    return jax.tree.leaves(g)[0]
timeit_chained("enc fwd+bwd", encg)
lp32 = jax.jit(lambda: model.apply(params, feats, carry, fm)[0].astype(jnp.float32))()
timeit_chained("ctc optax fwd+bwd", lambda: jax.grad(lambda lg: jnp.mean(ctc_loss_per_example(lg, in_lens, tokens, tok_lens, impl="optax")))(lp32))
timeit_chained("greedy decode", lambda: ctc_greedy_decode(lp32, in_lens, 0)[0])
timeit_chained("frontend", lambda: compute_features(audio, cfg.frontend))
