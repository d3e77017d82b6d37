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
state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 64)
carry = init_carry(cfg.model, B)
fe = cfg.frontend

def tmark(name, fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)

def fwd_only(params, carry, audio, smask):
    feats = compute_features(audio, fe)
    fm, in_lens = compute_frame_mask(smask, feats.shape[1], 1)
    logits, ns = model.apply(params, feats, carry, fm)
    return logits

tmark("a) frontend+mask+enc fwd", jax.jit(fwd_only), state.params, carry, audio, smask)

def loss_fn(params, carry, audio, smask):
    feats = compute_features(audio, fe)
    fm, in_lens = compute_frame_mask(smask, feats.shape[1], 1)
    in_lens = jnp.maximum(in_lens, 1)
    logits, ns = model.apply(params, feats, carry, fm)
    per = ctc_loss_per_example(logits, in_lens, tokens, tok_lens, impl="optax")
    return jnp.mean(per)

tmark("b) +ctc fwd", jax.jit(loss_fn), state.params, carry, audio, smask)
tmark("c) grad", jax.jit(jax.grad(loss_fn)), state.params, carry, audio, smask)

def full(state, carry, audio, smask):
    def lf(p):
        feats = compute_features(audio, fe)
        fm, in_lens = compute_frame_mask(smask, feats.shape[1], 1)
        in_lens = jnp.maximum(in_lens, 1)
        logits, ns = model.apply(p, feats, carry, fm)
        per = ctc_loss_per_example(logits, in_lens, tokens, tok_lens, impl="optax")
        return jnp.mean(per), (logits, ns, in_lens)
    (loss,(logits,ns,in_lens)), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
    gn = optax.global_norm(grads)
    state2 = state.apply_gradients(grads=grads)
    return state2, ns, loss, gn

tmark("d) grad+update", jax.jit(full), state, carry, audio, smask)

def full2(state, carry, audio, smask):
    st, ns, loss, gn = full(state, carry, audio, smask)
    # decode
    feats = compute_features(audio, fe)
    return st, ns, loss, gn

def full3(state, carry, audio, smask):
    def lf(p):
        feats = compute_features(audio, fe)
        fm, in_lens = compute_frame_mask(smask, feats.shape[1], 1)
        in_lens = jnp.maximum(in_lens, 1)
        logits, ns = model.apply(p, feats, carry, fm)
        per = ctc_loss_per_example(logits, in_lens, tokens, tok_lens, impl="optax")
        return jnp.mean(per), (logits, ns, in_lens)
    (loss,(logits,ns,in_lens)), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
    gn = optax.global_norm(grads)
    state2 = state.apply_gradients(grads=grads)
    preds, keep = ctc_greedy_decode(jax.lax.stop_gradient(logits), in_lens, 0)
    return state2, ns, loss, gn, preds, keep

tmark("e) grad+update+decode", jax.jit(full3), state, carry, audio, smask)
