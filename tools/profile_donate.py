import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.train import step as step_mod
from statecatcher_tpu.train.step import init_train_state

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
carry = init_carry(cfg.model, B, jnp.dtype(cfg.model.dtype))

for donate in (False, True):
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 64)
    c = carry
    # monkeypatch: rebuild step with/without donation
    import statecatcher_tpu.train.step as sp
    orig_jit = jax.jit
    def patched_jit(f, donate_argnums=None, **kw):
        if donate:
            return orig_jit(f, donate_argnums=donate_argnums, **kw)
        return orig_jit(f, **kw)
    jax.jit = patched_jit
    ts = sp.make_train_step(model, cfg, blank_id=0, ctc_impl="optax")
    jax.jit = orig_jit
    st, c2, out = ts(state, c, audio, mask, tokens, tok_lens, row_valid)
    jax.block_until_ready(out.loss)
    n=10
    t0=time.perf_counter()
    for _ in range(n):
        st, c2, out = ts(st, c2, audio, mask, tokens, tok_lens, row_valid)
    jax.block_until_ready(out.loss)
    print(f"donate={donate}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)
