import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.train.step import init_train_state, make_train_step

B=8; sec=16.0; sr=16000; S=int(sr*sec)
cfg = Config().apply_overrides(["--model.encoder","lucyrnn","--model.hidden_size","512","--model.num_layers","4","--model.vocab_size","1024","--model.dtype","bfloat16","--data.batch_size",str(B),"--data.target_duration",str(sec)])
model = build_model(cfg.model, 80)
rng=np.random.default_rng(0)
audio = jnp.asarray(rng.uniform(-0.3,0.3,(B,S)).astype(np.float32))
mask = jnp.ones((B,S),jnp.bool_)
U=128
tokens = jnp.asarray(rng.integers(1,1024,(B,U)).astype(np.int32))
tok_lens = jnp.full((B,),U,jnp.int32)
row_valid = jnp.ones((B,),jnp.bool_)
state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 64)
carry = init_carry(cfg.model, B, jnp.dtype(cfg.model.dtype))
ts = make_train_step(model, cfg, blank_id=0, ctc_impl="optax")

K = 10
@jax.jit
def multi(state, carry):
    def body(i, sc):
        s, c = sc
        s, c, out = ts(s, c, audio, mask, tokens, tok_lens, row_valid)
        return (s, c)
    s, c = jax.lax.fori_loop(0, K, body, (state, carry))
    return s, c

s2, c2 = multi(state, carry)
jax.block_until_ready(c2)
t0=time.perf_counter()
s2, c2 = multi(state, carry)
jax.block_until_ready(c2)
dt = (time.perf_counter()-t0)/K
print(f"chained-in-jit per step: {dt*1000:.1f} ms -> {B*sec/dt:.1f} audio-sec/s", flush=True)
