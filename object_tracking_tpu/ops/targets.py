"""YOLOv2 training-target encoding as a jittable fixed-shape op.

Replaces the per-object Python loop of the reference generator
(/root/reference/utility/preprocessing.py:214-293
`BatchGenerator.output_from_instance`):

- per object: grid-cell center/size in cell units (preprocessing.py:228-240),
- best anchor by IoU of the (0, 0, w, h)-shifted box (:244-259),
- write y[grid_y, grid_x, anchor] = [box, 1, one-hot]    (:262-264),
- append the box to a rolling TRUE_BOX_BUFFER slot       (:267-270).

Objects arrive as padded fixed-size arrays (boxes (M, 4) corner-format in
pixels, class ids (M,), validity mask (M,)). The write loop is a
`lax.fori_loop` so the reference's *last-object-wins* overwrite semantics
on cell/anchor collisions are preserved exactly; the true-box slot counter
advances only for accepted objects and wraps at the buffer size, as in the
reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from object_tracking_tpu.ops.boxes import iou_center


@functools.partial(
    jax.jit,
    static_argnames=('image_h', 'image_w', 'grid_h', 'grid_w',
                     'num_classes', 'true_box_buffer'))
def encode_targets(boxes_xyxy: jnp.ndarray,
                   class_ids: jnp.ndarray,
                   valid: jnp.ndarray,
                   anchors: jnp.ndarray,
                   *,
                   image_h: int = 416, image_w: int = 416,
                   grid_h: int = 13, grid_w: int = 13,
                   num_classes: int = 80,
                   true_box_buffer: int = 50
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode one frame's objects into YOLO targets.

    Args:
      boxes_xyxy: (M, 4) corner-format pixel boxes (xmin, ymin, xmax, ymax).
      class_ids: (M,) int class indices.
      valid: (M,) bool — padding mask (also encodes label filtering).
      anchors: flat (2A,) or (A, 2) anchor priors in grid-cell units.

    Returns:
      y: (grid_h, grid_w, A, 4+1+C) — cell-unit box, objectness, one-hot.
      b: (1, 1, 1, true_box_buffer, 4) rolling true-box buffer
         (cell-unit center-format), reference's side input
         (preprocessing.py:216, 267-270).
    """
    anchors = jnp.asarray(anchors, jnp.float32).reshape(-1, 2)
    num_anchors = anchors.shape[0]
    m = boxes_xyxy.shape[0]

    cell_w = float(image_w) / grid_w
    cell_h = float(image_h) / grid_h

    bx = boxes_xyxy.astype(jnp.float32)
    center_x = 0.5 * (bx[:, 0] + bx[:, 2]) / cell_w
    center_y = 0.5 * (bx[:, 1] + bx[:, 3]) / cell_h
    size_w = (bx[:, 2] - bx[:, 0]) / cell_w
    size_h = (bx[:, 3] - bx[:, 1]) / cell_h

    grid_x = jnp.floor(center_x).astype(jnp.int32)
    grid_y = jnp.floor(center_y).astype(jnp.int32)

    # Acceptance: non-degenerate box, in-grid center, valid label
    # (preprocessing.py:227, 236).
    ok = (valid
          & (bx[:, 2] > bx[:, 0]) & (bx[:, 3] > bx[:, 1])
          & (grid_x < grid_w) & (grid_y < grid_h)
          & (grid_x >= 0) & (grid_y >= 0)
          & (class_ids >= 0) & (class_ids < num_classes))

    # Best anchor by IoU of the origin-shifted box (preprocessing.py:244-259).
    shifted = jnp.stack([jnp.zeros_like(size_w), jnp.zeros_like(size_h),
                         size_w, size_h], axis=-1)                 # (M, 4)
    anchor_boxes = jnp.concatenate(
        [jnp.zeros((num_anchors, 2), jnp.float32), anchors], axis=-1)
    ious = iou_center(shifted[:, None, :], anchor_boxes[None, :, :])
    best_anchor = jnp.argmax(ious, axis=-1).astype(jnp.int32)       # (M,)

    cell_box = jnp.stack([center_x, center_y, size_w, size_h], axis=-1)
    one_hot = jax.nn.one_hot(class_ids, num_classes, dtype=jnp.float32)
    y_rows = jnp.concatenate(
        [cell_box, jnp.ones((m, 1), jnp.float32), one_hot], axis=-1)

    y0 = jnp.zeros((grid_h, grid_w, num_anchors, 4 + 1 + num_classes),
                   jnp.float32)
    b0 = jnp.zeros((true_box_buffer, 4), jnp.float32)

    def body(i, carry):
        y, b, tbi = carry
        gy = jnp.clip(grid_y[i], 0, grid_h - 1)
        gx = jnp.clip(grid_x[i], 0, grid_w - 1)
        new_y = y.at[gy, gx, best_anchor[i]].set(y_rows[i])
        new_b = b.at[tbi % true_box_buffer].set(cell_box[i])
        accept = ok[i]
        y = jnp.where(accept, new_y, y)
        b = jnp.where(accept, new_b, b)
        tbi = tbi + accept.astype(jnp.int32)
        return y, b, tbi

    y, b, _ = jax.lax.fori_loop(
        0, m, body, (y0, b0, jnp.int32(0)))
    return y, b.reshape(1, 1, 1, true_box_buffer, 4)


def encode_targets_batch(boxes_xyxy, class_ids, valid, anchors, **kw):
    """vmap over a leading batch (or batch·time) axis."""
    fn = functools.partial(encode_targets, anchors=anchors, **kw)
    return jax.vmap(lambda b, c, v: fn(b, c, v))(boxes_xyxy, class_ids,
                                                 valid)


@functools.partial(
    jax.jit,
    static_argnames=('heads', 'image_h', 'image_w', 'true_box_buffer'))
def encode_targets_multiscale(boxes_xyxy: jnp.ndarray,
                              class_ids: jnp.ndarray,
                              valid: jnp.ndarray,
                              heads: Tuple[Tuple, ...],
                              *,
                              image_h: int = 416, image_w: int = 416,
                              true_box_buffer: int = 50):
    """Multi-scale ([yolo]-head, v3-family) target encoding.

    Each GT box is OWNED by exactly one head: the one holding the
    globally best-IoU anchor for the box's (w, h) — the standard v3
    assignment rule (anchors compared in pixels, since [yolo] cfg
    anchors are pixel-sized, models/darknet_cfg.py head_specs). The
    owned box is then written into that head's grid in that head's
    cell units via `encode_targets` (whose local best-anchor argmax
    agrees with the global winner restricted to the owning head). The
    reference's cfg boundary is inference-only for [yolo] heads
    (/root/reference/models_detection/YOLO.py:128-134), so this — like
    the working standalone detector training itself — exceeds parity.

    Args:
      heads: static tuple per head:
        (anchors_px flat tuple, grid_h, grid_w, num_classes).
      Remaining args as `encode_targets`, boxes in pixels.

    Returns:
      (y_heads, b_heads): tuples with one (GH_h, GW_h, A_h, 5+C) target
      and one (1, 1, 1, TB, 4) cell-unit true-box buffer per head. Each
      head's buffer holds ALL valid boxes (in its own cell units) — the
      loss's no-object best-IoU suppression needs every object, not
      just the owned ones.
    """
    # Global best anchor across heads (pixel units).
    all_px = jnp.concatenate([
        jnp.asarray(h[0], jnp.float32).reshape(-1, 2) for h in heads])
    sizes_px = jnp.stack([boxes_xyxy[:, 2] - boxes_xyxy[:, 0],
                          boxes_xyxy[:, 3] - boxes_xyxy[:, 1]],
                         axis=-1).astype(jnp.float32)          # (M, 2)
    shifted = jnp.concatenate([jnp.zeros_like(sizes_px), sizes_px],
                              axis=-1)
    anchor_boxes = jnp.concatenate(
        [jnp.zeros_like(all_px), all_px], axis=-1)
    ious = iou_center(shifted[:, None, :], anchor_boxes[None, :, :])
    best = jnp.argmax(ious, axis=-1)                           # (M,)

    counts = [len(h[0]) // 2 for h in heads]
    offsets = []
    off = 0
    for c in counts:
        offsets.append(off)
        off += c

    y_heads, b_heads = [], []
    for (anchors_px, gh, gw, classes), off, cnt in zip(heads, offsets,
                                                       counts):
        own = valid & (best >= off) & (best < off + cnt)
        # pixel anchors → this head's grid-cell units
        a_px = jnp.asarray(anchors_px, jnp.float32).reshape(-1, 2)
        a_cells = a_px * jnp.asarray(
            [gw / image_w, gh / image_h], jnp.float32)
        y, _ = encode_targets(
            boxes_xyxy, class_ids, own, a_cells,
            image_h=image_h, image_w=image_w, grid_h=gh, grid_w=gw,
            num_classes=classes, true_box_buffer=true_box_buffer)
        # Buffer of ALL valid boxes in this head's cell units.
        _, b = encode_targets(
            boxes_xyxy, class_ids,
            valid & (class_ids >= 0) & (class_ids < classes), a_cells,
            image_h=image_h, image_w=image_w, grid_h=gh, grid_w=gw,
            num_classes=classes, true_box_buffer=true_box_buffer)
        y_heads.append(y)
        b_heads.append(b)
    return tuple(y_heads), tuple(b_heads)
