"""True multi-process jax.distributed smoke test (SURVEY.md §4d: multi-host
without a cluster) — two OS processes, CPU backend, local coordinator;
verifies global device visibility and a cross-process psum."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platform_name", "cpu")
from statecatcher_tpu.parallel.distributed import initialize_distributed, per_host_batch_size

port, pid = sys.argv[1], int(sys.argv[2])
topo = initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert topo.process_count == 2, topo
assert jax.device_count() >= 2, jax.devices()
assert per_host_batch_size(32, topo) == 16

import jax.numpy as jnp
from jax.experimental import multihost_utils

# cross-process agreement: sum of per-process values over all hosts
val = jnp.asarray([float(pid + 1)])
total = multihost_utils.process_allgather(val).sum()
assert float(total) == 3.0, total
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode("utf-8", "replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} OK" in out
