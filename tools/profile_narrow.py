import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
import optax
from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.frontend import compute_features, compute_frame_mask
from statecatcher_tpu.ops.ctc import ctc_loss_per_example
from statecatcher_tpu.decode import ctc_greedy_decode
from statecatcher_tpu.train.step import init_train_state

B=8; sec=16.0; sr=16000; S=int(sr*sec)
cfg = Config().apply_overrides(["--model.encoder","lucyrnn","--model.hidden_size","512","--model.num_layers","4","--model.vocab_size","1024","--model.dtype","bfloat16","--data.batch_size",str(B),"--data.target_duration",str(sec)])
model = build_model(cfg.model, 80)
rng=np.random.default_rng(0)
audio = jnp.asarray(rng.uniform(-0.3,0.3,(B,S)).astype(np.float32))
smask = jnp.ones((B,S),jnp.bool_)
U=128
tokens = jnp.asarray(rng.integers(1,1024,(B,U)).astype(np.int32))
tok_lens = jnp.full((B,),U,jnp.int32)
row_valid = jnp.ones((B,),jnp.bool_)
carry0 = init_carry(cfg.model, B)
fe = cfg.frontend

def tmark(name, fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)

def make(variant):
    def step(state, carry, audio, smask, tokens, tok_lens, row_valid):
        feats = compute_features(audio, fe)
        fm, in_lens = compute_frame_mask(smask, feats.shape[1], 1)
        in_lens = jnp.maximum(in_lens, 1)
        carry_in = jax.lax.stop_gradient(carry) if "sg" in variant else carry
        def lf(p):
            logits, ns = model.apply(p, feats, carry_in, fm)
            per = ctc_loss_per_example(logits, in_lens, tokens, tok_lens, impl="optax")
            if "rowvalid" in variant:
                valid = row_valid.astype(per.dtype)
                loss = jnp.sum(per*valid)/jnp.maximum(jnp.sum(valid),1.0)
            else:
                loss = jnp.mean(per)
            return loss, (logits, ns)
        (loss,(logits,ns)), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        gn = optax.global_norm(grads) if "gn" in variant else loss
        state = state.apply_gradients(grads=grads)
        if "decode" in variant:
            preds, keep = ctc_greedy_decode(jax.lax.stop_gradient(logits), in_lens, 0)
            return state, ns, loss, gn, preds, keep
        return state, ns, loss, gn
    return jax.jit(step)

for variant in ("plain", "sg", "rowvalid", "gn", "decode", "sg+rowvalid+gn+decode"):
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 64)
    fn = make(variant)
    tmark(variant, fn, state, carry0, audio, smask, tokens, tok_lens, row_valid)
