"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4d).  Set STATECATCHER_TEST_TPU=1
to run the TPU-marked kernel tests on a real chip.
"""

import os

# Must be set before jax import.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs a real TPU chip")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    run_tpu = os.environ.get("STATECATCHER_TEST_TPU") == "1"
    skip_tpu = pytest.mark.skip(reason="set STATECATCHER_TEST_TPU=1 to run on TPU")
    for item in items:
        if "tpu" in item.keywords and not run_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
