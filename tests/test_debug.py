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
