import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.frontend import compute_features, compute_frame_mask
from statecatcher_tpu.ops.ctc import ctc_loss_per_example

B=8; sec=16.0; sr=16000; S=int(sr*sec)
impl = os.environ.get("PROF_SCAN", "assoc")
cfg = Config().apply_overrides(["--model.encoder","lucyrnn","--model.hidden_size","512","--model.num_layers","4","--model.vocab_size","1024","--model.dtype","bfloat16","--model.lucyrnn.kernel_impl",impl,"--data.batch_size",str(B),"--data.target_duration",str(sec)])
model = build_model(cfg.model, 80)
rng=np.random.default_rng(0)
audio = jnp.asarray(rng.uniform(-0.3,0.3,(B,S)).astype(np.float32))
mask = jnp.ones((B,S),jnp.bool_)
U=128
tokens = jnp.asarray(rng.integers(1,1024,(B,U)).astype(np.int32))
tok_lens = jnp.full((B,),U,jnp.int32)
carry = init_carry(cfg.model, B)
feats = jax.jit(lambda a: compute_features(a, cfg.frontend))(audio)
T = feats.shape[1]
fm, in_lens = compute_frame_mask(mask, T)
in_lens = jnp.maximum(in_lens,1)
params = model.init(jax.random.PRNGKey(0), feats, carry)

def timeit(name, fn, *args, n=5):
    t0=time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    print(f"{name}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)
    return out

which = os.environ.get("PROF_WHICH", "enc,ctc")
if "enc" in which:
    enc_fwd = jax.jit(lambda p,f,c: model.apply(p,f,c,fm))
    logits, _ = timeit(f"encoder[{impl}] fwd", enc_fwd, params, feats, carry)
    def enc_loss(p,f,c):
        lg, st = model.apply(p,f,c,fm)
        return jnp.sum(lg.astype(jnp.float32)**2)*1e-6
    enc_bwd = jax.jit(jax.grad(enc_loss))
    timeit(f"encoder[{impl}] fwd+bwd", enc_bwd, params, feats, carry)
else:
    logits = jnp.asarray(rng.standard_normal((B,T,1024)).astype(np.float32))
if "ctc" in which:
    for ci in ("lattice","optax"):
        f = jax.jit(lambda lg, ci=ci: jnp.mean(ctc_loss_per_example(lg, in_lens, tokens, tok_lens, impl=ci)))
        timeit(f"ctc-{ci} fwd", f, logits)
        g = jax.jit(jax.grad(lambda lg, ci=ci: jnp.mean(ctc_loss_per_example(lg, in_lens, tokens, tok_lens, impl=ci))))
        timeit(f"ctc-{ci} fwd+bwd", g, logits.astype(jnp.float32))
