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
