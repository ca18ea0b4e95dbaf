"""Greedy multi-class NMS as a single Pallas TPU kernel.

The JAX formulation (ops/nms.py `_nms_all_classes_matmul`) runs K rounds
of small ops under `lax.fori_loop`; each round is its own fusion with
HBM-visible intermediates. This kernel keeps the whole working set — the
(K, K) IoU matrix, (K, C) score/alive/done masks — resident in VMEM for
all K rounds: one kernel launch, zero intermediate HBM traffic, with the
per-round row-select still an MXU matmul.

Semantics are the reference's greedy per-class walk
(/root/reference/utility/utils.py:239-252): identical outputs to both
`ops.nms.greedy_nms_scores` implementations (see tests/test_pallas.py).

K and C should respect TPU tiling (K a multiple of 8 for f32 sublanes;
the lane dim is padded to 128 internally by Mosaic) — the framework's
default K=128 candidate cap is exactly one tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, out_ref, *, nms_threshold: float):
    boxes = boxes_ref[:]                       # (K, 4)
    scores = scores_ref[:]                     # (K, C)
    k, c = scores.shape

    # Pairwise center-format IoU, computed once into registers/VMEM.
    cx, cy = boxes[:, 0], boxes[:, 1]
    w, h = boxes[:, 2], boxes[:, 3]

    def overlap(center, size):
        lo = center - size * 0.5
        hi = center + size * 0.5
        return jnp.maximum(
            jnp.minimum(hi[:, None], hi[None, :])
            - jnp.maximum(lo[:, None], lo[None, :]), 0.0)

    inter = overlap(cx, w) * overlap(cy, h)
    area = w * h
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)    # (K, K)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, c), 0)

    # Early exit: each round settles one box per class (pick or no-op),
    # so the loop is done as soon as no class has a live, unprocessed,
    # positive-score candidate — after thresholding that is typically a
    # handful of rounds, not K. Extra rounds would be no-ops (active=0),
    # so stopping is exact.
    def cond(carry):
        alive, done = carry
        return jnp.max(scores * alive * (1.0 - done)) > 0.0

    def body(carry):
        alive, done = carry
        cand = scores * alive * (1.0 - done)
        best = jnp.argmax(cand, axis=0)                       # (C,)
        active = (jnp.max(cand, axis=0) > 0.0).astype(scores.dtype)
        onehot = (row_ids == best[None, :]).astype(scores.dtype)
        sel_iou = jnp.dot(onehot.T, iou,
                          preferred_element_type=jnp.float32)  # (C, K)
        suppress = ((sel_iou.T >= nms_threshold).astype(scores.dtype)
                    * (1.0 - done) * (1.0 - onehot))
        alive = alive * (1.0 - suppress * active[None, :])
        done = jnp.minimum(done + onehot * active[None, :], 1.0)
        return alive, done

    ones = jnp.ones((k, c), scores.dtype)
    alive, _ = jax.lax.while_loop(cond, body,
                                  (ones, jnp.zeros_like(ones)))
    out_ref[:] = scores * alive


@functools.partial(jax.jit,
                   static_argnames=('nms_threshold', 'interpret'))
def nms_scores_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
                      nms_threshold: float = 0.45,
                      interpret: bool = False) -> jnp.ndarray:
    """Suppressed per-class scores for a fixed candidate set.

    Args:
      boxes: (K, 4) center-format (cx, cy, w, h).
      scores: (K, C) thresholded class scores.
      interpret: run in the Pallas interpreter (for CPU tests).

    Returns:
      (K, C) scores with non-maximal entries zeroed.
    """
    return pl.pallas_call(
        functools.partial(_nms_kernel, nms_threshold=nms_threshold),
        out_shape=jax.ShapeDtypeStruct(scores.shape, scores.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes.astype(jnp.float32), scores.astype(jnp.float32))
