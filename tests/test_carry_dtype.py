"""fp32 carry under bf16 activations (ModelConfig.carry_dtype).

The reference under AMP carries fp16 state between segments (reference
train.py:515-526); on long recordings every segment boundary then costs a
rounding of the recurrent state.  ``carry_dtype="float32"`` keeps the carried
state full-precision while activations stay bfloat16.
"""

import numpy as np

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, carry_dtype, init_carry


def _cfg(dtype="bfloat16", carry="auto"):
    return Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "64",
        "--model.num_layers", "2", "--model.vocab_size", "16",
        "--model.dtype", dtype, "--model.carry_dtype", carry,
    ])


def test_carry_dtype_resolution():
    assert carry_dtype(_cfg("bfloat16", "auto").model) == jnp.bfloat16
    assert carry_dtype(_cfg("bfloat16", "float32").model) == jnp.float32
    assert carry_dtype(_cfg("float32", "auto").model) == jnp.float32


def test_carry_comes_back_in_configured_dtype(rng):
    cfg = _cfg("bfloat16", "float32")
    model = build_model(cfg.model, 8)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    carry = init_carry(cfg.model, 2)
    assert carry["h"].dtype == jnp.float32
    _, new_state = model.apply(params, x, carry)
    assert new_state["h"].dtype == jnp.float32
    assert new_state["s"].dtype == jnp.float32


def _run_segments(cfg, params_src_cfg, feats, n_segments):
    """Thread carry through n_segments; return the final carry in f64."""
    model = build_model(cfg.model, feats.shape[-1])
    # identical params for all dtypes: init in f32 config, cast if needed
    params = build_model(params_src_cfg.model, feats.shape[-1]).init(
        jax.random.PRNGKey(0), jnp.asarray(feats[0]))
    carry = init_carry(cfg.model, feats.shape[1])

    @jax.jit
    def seg(params, carry, x):
        _, new = model.apply(params, x, carry)
        return new

    for s in range(n_segments):
        carry = seg(params, carry, jnp.asarray(feats[s]))
    return jax.tree.map(lambda a: np.asarray(a, np.float64), carry)


def _rel_drift(c, ref):
    out = 0.0
    for k in ref:
        out += np.mean(np.abs(c[k] - ref[k])) / (np.mean(np.abs(ref[k])) + 1.0)
    return out


def test_carry_rounding_is_the_isolated_mechanism(rng):
    """f32 compute with a bf16 carry drifts from the all-f32 run purely
    through the per-segment-boundary rounding; an f32 carry removes it."""
    n_seg, B, T, F = 64, 2, 24, 8
    feats = rng.standard_normal((n_seg, B, T, F)).astype(np.float32) * 0.5

    ref = _run_segments(_cfg("float32", "auto"), _cfg("float32"), feats, n_seg)
    rounded = _run_segments(_cfg("float32", "bfloat16"), _cfg("float32"), feats, n_seg)
    kept = _run_segments(_cfg("float32", "float32"), _cfg("float32"), feats, n_seg)

    assert _rel_drift(kept, ref) == 0.0
    assert _rel_drift(rounded, ref) > 0.0


def test_fp32_carry_no_worse_under_bf16_activations(rng):
    """With bf16 activations (drift dominated by compute rounding), the fp32
    carry tracks the full-f32 run at least as closely as the bf16 carry."""
    n_seg, B, T, F = 64, 2, 24, 8
    feats = rng.standard_normal((n_seg, B, T, F)).astype(np.float32) * 0.5

    ref = _run_segments(_cfg("float32"), _cfg("float32"), feats, n_seg)
    d_bf16 = _rel_drift(
        _run_segments(_cfg("bfloat16", "auto"), _cfg("float32"), feats, n_seg), ref
    )
    d_f32 = _rel_drift(
        _run_segments(_cfg("bfloat16", "float32"), _cfg("float32"), feats, n_seg), ref
    )
    assert d_f32 <= d_bf16 * 1.05 + 1e-6, (d_f32, d_bf16)
