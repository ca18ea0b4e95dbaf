"""Tensor-parallel parameter sharding over the mesh `model` axis.

The reference has no tensor parallelism (SURVEY.md §2: its multi-device
story is env-var GPU pinning). Here TP is expressed the GSPMD way: lay the
*parameters* out sharded and let XLA propagate — no model-code changes,
no hand-written collectives. Each large conv kernel (H, W, I, O) gets its
output-channel axis sharded over `model`; the matching bias shards the
same way; everything else replicates. XLA then partitions the convs,
inserts the all-gathers/reduce-scatters over ICI where layouts meet, and
the same jitted train step runs dp-only (model=1) or dp×tp unchanged.

Heuristic: shard only kernels whose output channels divide the axis size
and whose parameter count crosses `min_params` — tiny kernels cost more
in collective latency than they save in FLOPs/memory.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def plan_tp_specs(variables: Any, mesh: Mesh,
                  model_axis: str = 'model',
                  min_params: int = 1 << 16) -> Any:
    """PartitionSpec pytree for `variables` implementing channel-TP.

    Conv kernels (ndim >= 2, trailing axis = output channels) shard their
    last axis over `model_axis`; 1-D biases/scales shard when their
    (output-channel) length divides the axis; scalars and small leaves
    replicate. BatchNorm statistics replicate — they are reduced over the
    batch, which lives on the `data` axis.
    """
    tp = mesh.shape[model_axis]

    def leaf_spec(path, leaf):
        if tp <= 1:
            return P()
        path_str = '/'.join(str(getattr(p, 'key', p)) for p in path)
        shape = np.shape(leaf)
        if 'batch_stats' in path_str:
            return P()
        # MoE expert-stacked parameters (leading axis = experts, see
        # models/moe_head.py) shard their EXPERT axis — that is expert
        # parallelism, and it beats channel-TP for them because routing
        # already keeps each token's compute on one expert.
        if '_moe' in path_str and len(shape) >= 2 and shape[0] % tp == 0:
            return P(model_axis, *([None] * (len(shape) - 1)))
        if len(shape) >= 2 and shape[-1] % tp == 0 \
                and int(np.prod(shape)) >= min_params:
            return P(*([None] * (len(shape) - 1)), model_axis)
        if len(shape) == 1 and shape[0] % tp == 0 \
                and shape[0] >= 4 * tp and 'bias' in path_str:
            return P(model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, variables)


def shard_variables(mesh: Mesh, variables: Any,
                    model_axis: str = 'model',
                    min_params: int = 1 << 16) -> Any:
    """device_put `variables` with the TP layout from `plan_tp_specs`."""
    specs = plan_tp_specs(variables, mesh, model_axis, min_params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(
            leaf, NamedSharding(mesh, spec)),
        variables, specs)


def tp_sharding_summary(variables: Any, mesh: Mesh,
                        model_axis: str = 'model',
                        min_params: int = 1 << 16
                        ) -> Dict[str, Tuple[int, int]]:
    """{'sharded': (leaves, params), 'replicated': (leaves, params)} —
    for logging what the plan actually split."""
    specs = plan_tp_specs(variables, mesh, model_axis, min_params)
    stats = {'sharded': [0, 0], 'replicated': [0, 0]}
    for leaf, spec in zip(jax.tree_util.tree_leaves(variables),
                          jax.tree_util.tree_leaves(
                              specs, is_leaf=lambda s: isinstance(s, P))):
        key = 'sharded' if any(a is not None for a in spec) \
            else 'replicated'
        stats[key][0] += 1
        stats[key][1] += int(np.prod(np.shape(leaf)))
    return {k: tuple(v) for k, v in stats.items()}
