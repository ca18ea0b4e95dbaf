"""Mixture-of-experts grid head: the EP-shardable tracking head.

Optional replacement for MultiObjDetTracker's dense 1x1 output conv
(reference: models_tracking/MultiObjDetTracker.py:182-183 — a single
`Conv2D(BOX*(5+CLASS), 1x1)`). Every grid cell's ConvLSTM feature vector
is a token; tokens route top-1 to one of E expert MLPs (Switch-style,
fixed capacity, overflow drops to zero) and the chosen expert's output
is scaled by the gate probability. A 1x1 conv is exactly a per-token
dense layer, so this is the drop-in conditional-compute generalisation:
E times the head parameters at ~constant per-token FLOPs.

The expert-stacked parameters carry their expert axis as a leading
tensor dimension, which `parallel/sharding.py::plan_tp_specs` shards
over the mesh `model` axis (the `_moe` rule) — expert parallelism via
GSPMD. The explicit all_to_all formulation of the same computation
lives in `parallel/expert.py::expert_parallel_moe` and is tested
equivalent.

The Switch load-balancing auxiliary loss is sown under
`intermediates/moe_aux_loss`; `training/steps.py` adds it to the joint
objective when present.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from object_tracking_tpu.parallel.expert import moe_apply


class MoEGridHead(nn.Module):
    """Per-grid-cell top-1 MoE head.

    Input (..., D) → output (..., out_features); all leading axes are
    flattened into one token axis for routing (one routing group by
    default — set `num_groups` > 1 for group-local routing that matches
    `expert_parallel_moe` over that many devices).
    """
    num_experts: int
    hidden: int
    out_features: int
    capacity_factor: float = 1.25
    num_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        *lead, d = z.shape
        e, h, o = self.num_experts, self.hidden, self.out_features

        def scaled(fan_in):
            def init(key, shape, dtype=jnp.float32):
                return (jax.random.normal(key, shape) /
                        math.sqrt(fan_in)).astype(dtype)
            return init

        params = {
            'gate': self.param('gate', scaled(d), (d, e)),
            'w1': self.param('w1', scaled(d), (e, d, h)),
            'b1': self.param('b1', nn.initializers.zeros, (e, h)),
            'w2': self.param('w2', scaled(h), (e, h, o)),
            'b2': self.param('b2', nn.initializers.zeros, (e, o)),
        }
        params = {k: v.astype(self.dtype) for k, v in params.items()}
        tokens = z.reshape(-1, d).astype(self.dtype)
        out, aux = moe_apply(params, tokens, num_groups=self.num_groups,
                             capacity_factor=self.capacity_factor,
                             return_aux=True)
        self.sow('intermediates', 'moe_aux_loss', aux)
        return out.reshape(*lead, o)
