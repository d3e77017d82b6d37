"""Multi-host initialization and per-host data ownership.

The reference is single-process/single-device (SURVEY.md §2.3); here the
multi-host story is:

  * ``initialize_distributed()`` wires up ``jax.distributed`` (coordinator
    address/process id from env or args — standard TPU pod metadata works
    out of the box on Cloud TPU since jax reads it automatically).
  * every host runs its OWN ``SpeechDataset`` HTTP session (the
    speechcatcher-data server's session/batch protocol already coordinates
    many independent trainers, reference README.md:14), and owns
    B_global / num_hosts utterances per step — so carry-state rows never
    cross hosts and no input resharding traffic exists.
  * gradient allreduce across hosts is emitted by XLA from the pjit
    shardings (ICI within a slice, DCN across slices); nothing here issues
    collectives by hand.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import jax

logger = logging.getLogger("statecatcher.distributed")


@dataclass
class HostTopology:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int

    @property
    def is_primary(self) -> bool:
        return self.process_index == 0


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostTopology:
    """Initialize multi-host JAX if needed; no-op for a single process.

    On Cloud TPU pods, ``jax.distributed.initialize()`` with no arguments
    discovers everything from the TPU metadata service.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    topo = HostTopology(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )
    logger.info(
        "distributed topology: process %d/%d, %d local / %d global devices",
        topo.process_index, topo.process_count,
        topo.local_devices, topo.global_devices,
    )
    return topo


def per_host_batch_size(global_batch: int, topo: HostTopology) -> int:
    """Each host owns an equal contiguous slice of the global batch."""
    if global_batch % topo.process_count != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {topo.process_count} hosts"
        )
    return global_batch // topo.process_count


def psum_scalar(x, axis_name: str = "data"):
    """Cross-replica scalar sum for metrics (inside pjit/shard_map only)."""
    return jax.lax.psum(x, axis_name)


# --------------------------------------------------------------------- #
# Multi-process array plumbing for the full training loop
# (single-process calls collapse to plain device_put / identity, so the
#  loop has ONE code path; reference has no counterpart — SURVEY.md §2.3).
# --------------------------------------------------------------------- #

def make_global(local_array, sharding):
    """Assemble a global jax.Array from each process's local slice.

    ``local_array``: this host's rows for dimensions sharded across
    processes, full size along replicated dimensions.  Single-process:
    a plain ``device_put``.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_array)
    )


def local_rows(global_array, batch_axis: int = 0):
    """This process's rows of a batch-sharded global array, as numpy,
    ordered by global batch index.  Fully-replicated arrays pass through."""
    import numpy as np

    if jax.process_count() == 1 or global_array.is_fully_replicated:
        return np.asarray(global_array)
    shards = sorted(
        global_array.addressable_shards,
        key=lambda s: s.index[batch_axis].start or 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=batch_axis)


def sync_int(value: int, reduce: str = "max") -> int:
    """Cross-process agreement on a host-computed integer (segment count K,
    token pad width U, …).  No-op for a single process."""
    if jax.process_count() == 1:
        return int(value)
    import numpy as np
    from jax.experimental import multihost_utils

    all_vals = multihost_utils.process_allgather(np.asarray([value], np.int64))
    return int(all_vals.max() if reduce == "max" else all_vals.min())


def shared_run_dir(run_dir: str, max_len: int = 512) -> str:
    """All processes adopt the primary's run directory (orbax multihost
    checkpointing requires one shared path).  No-op for a single process."""
    if jax.process_count() == 1:
        return run_dir
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    raw = run_dir.encode("utf-8")[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(out[out != 0]).decode("utf-8")
