"""Device mesh + sharding plan for data/model-parallel training.

The reference has no parallelism beyond a host-side worker pool (SURVEY.md
§2.3); this module is the TPU-native scaling layer it lacks:

  * mesh axes ``('data', 'model')`` over a v5e/v5p slice
    (``jax.distributed.initialize`` for multi-host; XLA emits the gradient
    allreduce over ICI/DCN from the shardings — no hand-written collectives)
  * batches AND carry-state pytrees are batch-major sharded on ``data``, so
    each utterance's recurrent state lives on the chip that processes it and
    never moves between steps
  * parameters are replicated across ``data`` and (optionally) sharded on
    ``model`` along the hidden dim — the recurrent scans are elementwise in
    D, so D-sharding needs no per-step collectives; only the in/out
    projections reduce-scatter/all-gather
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from statecatcher_tpu.config import MeshConfig


@dataclass
class MeshPlan:
    mesh: Mesh
    batch_spec: P         # leading-axis = batch
    state_spec: P         # carry pytrees: batch-major
    replicated: P

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def model_size(self) -> int:
        return self.mesh.shape["model"]

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.batch_spec)

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.replicated)

    def shard_batch(self, tree):
        return jax.device_put(tree, self.batch_sharding())

    def shard_replicated(self, tree):
        return jax.device_put(tree, self.replicated_sharding())


def tp_param_spec(path_str: str, ndim: int) -> P:
    """Tensor-parallel PartitionSpec for a parameter by name/rank.

    Megatron-style column parallelism on the recurrent cells' fused gate
    projections: the 7·D gate output dim shards across 'model', which makes
    the scans (elementwise in D) run on D/mp shards with no per-step
    collectives; XLA's sharding propagation inserts the all-gathers at the
    layer norms / output projection where full-D tensors are needed.
    """
    shard_out = ("gate_proj" in path_str or path_str.endswith("w_ih/kernel")
                 or "/q/" in path_str or "/k/" in path_str or "/v/" in path_str
                 or "/gate/" in path_str or "/up/" in path_str)
    if shard_out and ndim == 2:
        return P(None, "model")
    if shard_out and ndim == 1:
        return P("model")
    return P()


def shard_params_tp(params, plan: "MeshPlan"):
    """Apply tensor-parallel shardings to a params pytree."""
    import jax.tree_util as jtu

    def place(path, leaf):
        path_str = "/".join(
            str(getattr(p, "key", getattr(p, "idx", ""))) for p in path
        )
        spec = tp_param_spec(path_str, leaf.ndim)
        return jax.device_put(leaf, NamedSharding(plan.mesh, spec))

    return jtu.tree_map_with_path(place, params)


def make_mesh_plan(
    cfg: MeshConfig, devices: Optional[list] = None
) -> MeshPlan:
    """Build the ('data', 'model') mesh.

    ``devices`` defaults to all local devices; pass ``jax.devices('cpu')``
    for the virtual-device test path.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(f"Mesh {dp}x{mp} needs {dp*mp} devices, have {n}")
    devs = np.array(devices[: dp * mp]).reshape(dp, mp)
    mesh = Mesh(devs, ("data", "model"))
    return MeshPlan(
        mesh=mesh,
        batch_spec=P("data"),
        state_spec=P("data"),
        replicated=P(),
    )


