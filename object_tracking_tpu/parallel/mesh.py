"""Device mesh construction and sharding helpers.

Design (SURVEY.md §5 'distributed communication backend'): one
`jax.sharding.Mesh` with axes `(data, model)` spanning all visible chips.
Default layout is pure data parallelism — batch sharded over `data`,
parameters replicated — with the `model` axis reserved for tensor-parallel
layouts of the ConvLSTM/head convs. Collectives are inserted by XLA from
sharding annotations (`NamedSharding` on args + outputs), so gradient
psums ride ICI with no hand-written NCCL analogue.

Multi-host: `jax.distributed.initialize()` before calling `make_mesh`
makes the same program span DCN; nothing else changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from object_tracking_tpu.config import MeshConfig


def make_mesh(config: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the framework-wide mesh.

    data_parallel == -1 means "all devices not claimed by model_parallel".
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, config.model_parallel)
    dp = config.data_parallel
    if dp == -1:
        dp = n // mp
    if dp * mp > n:
        raise ValueError(
            f'mesh {dp}x{mp} needs {dp * mp} devices, have {n}')
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (config.data_axis, config.model_axis))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over `data`, replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    dp = mesh.shape[mesh.axis_names[0]]
    if global_batch % dp:
        raise ValueError(
            f'global batch {global_batch} not divisible by data axis {dp}')
    return global_batch // dp


def shard_batch(mesh: Mesh, tree):
    """device_put a host pytree with its leading axis sharded over `data`.

    This is the host→HBM boundary: one transfer per device slice, laid out
    so the subsequent pjit step needs no resharding collective.
    """
    dp = mesh.shape[mesh.axis_names[0]]

    def put(x):
        x = np.asarray(x)
        # Ragged tail batches (or leading dims smaller than the data axis)
        # replicate instead of shard — correctness first, and XLA still
        # partitions the compute where profitable.
        if x.ndim and x.shape[0] % dp == 0:
            return jax.device_put(x, data_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree_util.tree_map(put, tree)
