"""Bounding-box math as vectorized jittable functions.

Replaces the scalar Python helpers of the reference
(/root/reference/utility/utils.py:155-188 `bbox_iou`/`interval_overlap`
center-format; :82-110 `overlap_score` corner-format) with broadcasting
jnp ops that run on the VPU for any leading batch shape.

Formats:
- cxcywh: (center_x, center_y, w, h)
- xyxy:   (xmin, ymin, xmax, ymax)
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-10


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-format → corner-format."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner-format → center-format."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1, y2 - y1], axis=-1)


def interval_overlap(a_min, a_max, b_min, b_max):
    """Overlap length of [a_min, a_max] and [b_min, b_max], >= 0.

    Matches utility/utils.py:175-188 for non-degenerate intervals.
    """
    return jnp.maximum(
        jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0.0)


def iou_center(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of center-format boxes; broadcasts over leading dims.

    Matches utility/utils.py:155-173 `bbox_iou`.
    """
    a_xy, a_wh = a[..., :2], a[..., 2:4]
    b_xy, b_wh = b[..., :2], b[..., 2:4]
    a_min, a_max = a_xy - a_wh / 2.0, a_xy + a_wh / 2.0
    b_min, b_max = b_xy - b_wh / 2.0, b_xy + b_wh / 2.0
    iw = interval_overlap(a_min[..., 0], a_max[..., 0],
                          b_min[..., 0], b_max[..., 0])
    ih = interval_overlap(a_min[..., 1], a_max[..., 1],
                          b_min[..., 1], b_max[..., 1])
    inter = iw * ih
    union = (a_wh[..., 0] * a_wh[..., 1] + b_wh[..., 0] * b_wh[..., 1]
             - inter)
    return inter / (union + EPS)


def iou_corner(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of corner-format boxes; broadcasts over leading dims."""
    iw = interval_overlap(a[..., 0], a[..., 2], b[..., 0], b[..., 2])
    ih = interval_overlap(a[..., 1], a[..., 3], b[..., 1], b[..., 3])
    inter = iw * ih
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + EPS)


def pairwise_iou_center(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU: a (N, 4), b (M, 4) → (N, M), center format."""
    return iou_center(a[:, None, :], b[None, :, :])
