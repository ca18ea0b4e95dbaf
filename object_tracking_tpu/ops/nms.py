"""TPU-friendly greedy NMS over fixed-size score tensors.

The reference suppresses non-maximal boxes with an O(C·N²) Python loop over
`BoundBox` objects (/root/reference/utility/utils.py:239-252): per class,
walk boxes in descending class-score order; a box whose score was already
zeroed suppresses nothing; otherwise zero the class score of every
lower-ranked box with IoU >= threshold.

Here the same semantics run on device with static shapes:
- one shared (K, K) IoU matrix (class-independent),
- per class, a rank vector from a descending argsort,
- a `lax.fori_loop` over rank positions carrying an alive-mask; each step
  suppresses in a single vectorized VPU op,
- vmapped over classes, so the loop body does all classes per iteration.

Because scores below the objectness threshold are zeroed *before* NMS
(utils.py:216), boxes with no surviving class score can be dropped first:
`top_k` keeps only the K highest-max-score boxes, shrinking the loop from
N=grid·anchors (845) to K (default 128) with identical results whenever
fewer than K boxes survive thresholding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from object_tracking_tpu.ops.boxes import pairwise_iou_center


def _nms_one_class(scores_c: jnp.ndarray, iou: jnp.ndarray,
                   nms_threshold: float) -> jnp.ndarray:
    """Greedy-suppress one class. scores_c (K,), iou (K, K) → new scores."""
    k = scores_c.shape[0]
    order = jnp.argsort(-scores_c)          # descending
    rank = jnp.argsort(order)               # rank[i] = position of box i
    ranks = jnp.arange(k)

    def body(pos, alive):
        i = order[pos]
        # Box i suppresses strictly lower-ranked boxes iff it is still
        # alive and actually scored (zeros suppress nothing, utils.py:245).
        active = alive[i] & (scores_c[i] > 0.0)
        suppress = (iou[i] >= nms_threshold) & (rank > pos)
        return jnp.where(active, alive & ~suppress, alive)

    alive = jax.lax.fori_loop(0, k, body, jnp.ones((k,), dtype=bool))
    return scores_c * alive


@functools.partial(jax.jit, static_argnames=('nms_threshold', 'top_k'))
def greedy_nms_scores(boxes: jnp.ndarray, scores: jnp.ndarray,
                      nms_threshold: float = 0.45,
                      top_k: int = 128) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class greedy NMS on a fixed-size candidate set.

    Args:
      boxes: (N, 4) center-format (cx, cy, w, h), any consistent unit.
      scores: (N, C) per-class scores, already thresholded (zeros = dead).
      nms_threshold: IoU at or above which a box suppresses lower-ranked.
      top_k: candidate cap; 0 / >= N means exact full-N NMS.

    Returns:
      (kept_boxes (K, 4), kept_scores (K, C)) where K = min(top_k, N):
      the surviving candidate set with suppressed class scores zeroed.
    """
    n = boxes.shape[0]
    if top_k and top_k < n:
        best = jnp.max(scores, axis=-1)
        _, idx = jax.lax.top_k(best, top_k)
        boxes = boxes[idx]
        scores = scores[idx]
    iou = pairwise_iou_center(boxes, boxes)
    new_scores = jax.vmap(
        lambda sc: _nms_one_class(sc, iou, nms_threshold),
        in_axes=1, out_axes=1)(scores)
    return boxes, new_scores
