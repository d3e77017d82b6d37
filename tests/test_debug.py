import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.debug import check_carry, disable_debug, enable_debug


def test_enable_disable_debug():
    enable_debug()
    assert jax.config.jax_debug_nans
    disable_debug()
    assert not jax.config.jax_debug_nans


def test_check_carry_ok():
    carry = {"h": np.zeros((4, 2, 8)), "s": np.ones((4, 2, 8))}
    check_carry(carry, batch_size=4)


def test_check_carry_nonfinite():
    carry = {"h": np.array([[np.nan]])}
    with pytest.raises(FloatingPointError):
        check_carry(carry)


def test_check_carry_shape():
    carry = {"h": np.zeros((3, 2))}
    with pytest.raises(ValueError):
        check_carry(carry, batch_size=4)


def test_skip_bad_segment_updates(rng):
    """A segment whose loss exceeds the threshold leaves params and carry
    untouched (bad-segment filtering)."""
    import numpy as np
    import jax.numpy as jnp
    from statecatcher_tpu.config import Config
    from statecatcher_tpu.models.asr import build_model, init_carry
    from statecatcher_tpu.train.step import init_train_state, make_train_step

    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn", "--model.hidden_size", "16",
        "--model.num_layers", "1", "--model.vocab_size", "16",
        "--data.batch_size", "2", "--data.target_duration", "0.5",
        "--data.batch_samplerate", "8000",
        "--train.skip_loss_above", "1e-6",   # everything is "too high"
    ])
    model = build_model(cfg.model, 80)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 8)
    step = make_train_step(model, cfg)
    B, S, U = 2, 4000, 8
    rngn = np.random.default_rng(0)
    audio = jnp.asarray(rngn.uniform(-0.3, 0.3, (B, S)).astype(np.float32))
    carry = init_carry(cfg.model, B)
    p_before = jax.tree.leaves(state.params)[0].copy()
    state2, carry2, out = step(
        state, carry, audio, jnp.ones((B, S), jnp.bool_),
        jnp.asarray(rngn.integers(1, 16, (B, U)).astype(np.int32)),
        jnp.full((B,), 4, jnp.int32), jnp.ones((B,), jnp.bool_),
    )
    assert float(out.loss) > 1e-6  # loss was indeed above threshold
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state2.params)[0]), np.asarray(p_before)
    )
    np.testing.assert_array_equal(np.asarray(carry2["h"]), 0.0)
