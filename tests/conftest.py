"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4d).  Set STATECATCHER_TEST_TPU=1
to run the TPU-marked kernel tests on a real chip.
"""

import os

# XLA_FLAGS is read at backend initialization — set it before first jax use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax is already imported by a pytest plugin before conftest runs, so the
# JAX_PLATFORM_NAME env var is too late — use the config API instead.
if os.environ.get("STATECATCHER_TEST_TPU") != "1":
    jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs a real TPU chip")
    config.addinivalue_line("markers", "slow: long-running test")
    # TPU runs must stay single-process: xdist workers would each open a
    # client against the one tunneled chip.  This hook runs before xdist's
    # (trylast) pytest_configure, so clearing the options here prevents the
    # DSession from registering at all.
    if os.environ.get("STATECATCHER_TEST_TPU") == "1" and getattr(
        config.option, "numprocesses", None
    ):
        config.option.numprocesses = 0
        config.option.dist = "no"
        config.option.tx = []


def pytest_collection_modifyitems(config, items):
    run_tpu = os.environ.get("STATECATCHER_TEST_TPU") == "1"
    skip_tpu = pytest.mark.skip(reason="set STATECATCHER_TEST_TPU=1 to run on TPU")
    for item in items:
        if "tpu" in item.keywords and not run_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
