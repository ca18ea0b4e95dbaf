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

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from object_tracking_tpu.config import MeshConfig


_DISTRIBUTED_INITIALIZED = False


def distributed_init(config: Optional[MeshConfig] = None) -> bool:
    """Multi-host (DCN) wiring: call `jax.distributed.initialize` once,
    before any device query, iff `config.distributed` is set.

    The reference's whole distribution story is pinning two processes to
    two GPUs by env var (BaseTracker.py:40-48); the TPU-native story is
    one pjit program spanning every host's chips — this is the only
    per-process setup it needs. Idempotent; returns True when the
    distributed runtime is (now) initialized.
    """
    global _DISTRIBUTED_INITIALIZED
    config = config or MeshConfig()
    if not config.distributed:
        return False
    if _DISTRIBUTED_INITIALIZED:
        return True
    kwargs = {}
    if config.coordinator_address:
        kwargs['coordinator_address'] = config.coordinator_address
    if config.num_processes != -1:
        kwargs['num_processes'] = config.num_processes
    if config.process_id != -1:
        kwargs['process_id'] = config.process_id
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED_INITIALIZED = True
    return True


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


def shard_batch(mesh: Mesh, tree, axis: int = 0):
    """device_put a host pytree with `axis` sharded over `data`.

    This is the host→HBM boundary: one transfer per device slice, laid out
    so the subsequent pjit step needs no resharding collective. axis=0
    shards the batch dim (data parallelism); axis=1 shards the time dim
    of (B, T, ...) batches (sequence parallelism — pair with a model
    built with time_shards > 1).
    """
    dp = mesh.shape[mesh.axis_names[0]]

    def put(x):
        x = np.asarray(x)
        # Ragged axes (or dims smaller than the data axis) replicate
        # instead of shard — correctness first, and XLA still partitions
        # the compute where profitable. Replication costs dp× the memory
        # and transfer of sharding, so it is logged (once per offending
        # shape) rather than silent.
        if x.ndim > axis and x.shape[axis] % dp == 0:
            spec = [None] * x.ndim
            spec[axis] = mesh.axis_names[0]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        key = (x.shape, axis, dp)
        if key not in _REPLICATION_WARNED:
            _REPLICATION_WARNED.add(key)
            logging.getLogger(__name__).warning(
                'shard_batch: axis %d of %s not divisible by data axis '
                '%d — replicating (a %dx memory/transfer cliff); pad or '
                'drop the ragged batch to restore sharding', axis,
                x.shape, dp, dp)
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree_util.tree_map(put, tree)


_REPLICATION_WARNED: set = set()
