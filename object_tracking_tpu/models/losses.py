"""Loss functions as pure jittable code.

`yolo_loss` re-derives the YOLOv2 loss of the reference
(/root/reference/models_detection/KerasYOLO.py:81-234 `loss_fxn`) as a pure
function of (y_pred, y_true, true_boxes, step):

- predictions decode to cell units: sigmoid(xy)+cell offsets, exp(wh)·anchor
  (KerasYOLO.py:100-103);
- confidence target = IoU between each predicted box and the GT box owned
  by its cell/anchor, gated by objectness (:121-140);
- coord mask = objectness · COORD_SCALE (:149);
- conf mask = [best IoU vs the whole 50-slot true-box buffer < 0.6]
  · (1-obj) · NO_OBJECT_SCALE + obj · OBJECT_SCALE (:153-182);
- class mask = objectness · class_weights[class] (:185);
- warm-up (steps < warm_up_batches) regresses every anchor toward its
  prior (:190-199) — the reference's stateful `seen` tf.Variable becomes an
  explicit `step` argument in the train state;
- totals: normalized SSE for xy/wh/conf (each /2) + masked softmax CE
  (:204-214).

The `tf.Print` recall telemetry (:216-233) becomes a returned aux-metrics
dict — functional, so it survives jit and psum cleanly.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-6


def yolo_loss(y_pred: jnp.ndarray,
              y_true: jnp.ndarray,
              true_boxes: jnp.ndarray,
              anchors: jnp.ndarray,
              step: jnp.ndarray | int = 1_000_000,
              *,
              warm_up_batches: int = 0,
              object_scale: float = 5.0,
              no_object_scale: float = 1.0,
              coord_scale: float = 1.0,
              class_scale: float = 1.0,
              best_iou_threshold: float = 0.6,
              class_weights: Optional[jnp.ndarray] = None,
              ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """YOLOv2 loss.

    Args:
      y_pred: (B, GH, GW, A, 5+C) raw head output.
      y_true: (B, GH, GW, A, 5+C) targets from ops.targets.encode_targets
        (cell-unit box, objectness, one-hot class).
      true_boxes: (B, 1, 1, 1, T, 4) rolling buffer of cell-unit GT boxes.
      anchors: flat (2A,) or (A, 2) anchor priors in cell units.
      step: global step, drives the warm-up branch.

    Returns:
      (scalar loss, aux dict with per-component losses and recall).
    """
    y_pred = y_pred.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    true_boxes = true_boxes.astype(jnp.float32)
    grid_h, grid_w, num_anchors = y_pred.shape[1:4]
    num_classes = y_pred.shape[-1] - 5
    anchors = jnp.asarray(anchors, jnp.float32).reshape(1, 1, 1, -1, 2)
    if class_weights is None:
        class_weights = jnp.ones((num_classes,), jnp.float32)

    # Cell offset grid (x = column, y = row), KerasYOLO.py:84-87.
    cell_x = jax.lax.broadcasted_iota(
        jnp.float32, (1, grid_h, grid_w, num_anchors), 2)
    cell_y = jax.lax.broadcasted_iota(
        jnp.float32, (1, grid_h, grid_w, num_anchors), 1)
    cell_grid = jnp.stack([cell_x, cell_y], axis=-1)

    # Adjust prediction (KerasYOLO.py:96-109)
    pred_box_xy = jax.nn.sigmoid(y_pred[..., :2]) + cell_grid
    pred_box_wh = jnp.exp(y_pred[..., 2:4]) * anchors
    pred_box_conf = jax.nn.sigmoid(y_pred[..., 4])
    pred_box_class = y_pred[..., 5:]

    # Ground truth (KerasYOLO.py:111-143)
    true_box_xy = y_true[..., 0:2]
    true_box_wh = y_true[..., 2:4]
    objectness = y_true[..., 4]

    def iou(xy_a, wh_a, xy_b, wh_b):
        mins_a, maxes_a = xy_a - wh_a / 2.0, xy_a + wh_a / 2.0
        mins_b, maxes_b = xy_b - wh_b / 2.0, xy_b + wh_b / 2.0
        iw = jnp.maximum(
            jnp.minimum(maxes_a[..., 0], maxes_b[..., 0])
            - jnp.maximum(mins_a[..., 0], mins_b[..., 0]), 0.0)
        ih = jnp.maximum(
            jnp.minimum(maxes_a[..., 1], maxes_b[..., 1])
            - jnp.maximum(mins_a[..., 1], mins_b[..., 1]), 0.0)
        inter = iw * ih
        union = (wh_a[..., 0] * wh_a[..., 1]
                 + wh_b[..., 0] * wh_b[..., 1] - inter)
        # The reference divides unguarded (:138); a 1e-10 floor avoids
        # 0/0 NaNs when exp(wh) underflows against an empty buffer slot.
        return inter / (union + 1e-10)

    iou_scores = iou(pred_box_xy, pred_box_wh, true_box_xy, true_box_wh)
    true_box_conf = iou_scores * objectness
    true_box_class = jnp.argmax(y_true[..., 5:], axis=-1)

    # Masks (KerasYOLO.py:145-185)
    coord_mask = objectness[..., None] * coord_scale

    # Best IoU of each prediction against the full true-box buffer:
    # broadcast (B, GH, GW, A, 1, 2) vs (B, 1, 1, 1, T, 2) (:153-178).
    best_ious = jnp.max(
        iou(pred_box_xy[..., None, :], pred_box_wh[..., None, :],
            true_boxes[..., 0:2], true_boxes[..., 2:4]),
        axis=4)
    conf_mask = ((best_ious < best_iou_threshold).astype(jnp.float32)
                 * (1.0 - objectness) * no_object_scale
                 + objectness * object_scale)

    class_mask = (objectness * class_weights[true_box_class] * class_scale)

    # Warm-up branch (KerasYOLO.py:187-199): before warm_up_batches steps,
    # regress all non-responsible anchors toward their prior.
    no_boxes_mask = (coord_mask < coord_scale / 2.0).astype(jnp.float32)
    warm = jnp.asarray(step, jnp.float32) < float(warm_up_batches)
    true_box_xy = jnp.where(
        warm, true_box_xy + (0.5 + cell_grid) * no_boxes_mask, true_box_xy)
    true_box_wh = jnp.where(
        warm, true_box_wh + jnp.ones_like(true_box_wh) * anchors
        * no_boxes_mask, true_box_wh)
    coord_mask = jnp.where(warm, jnp.ones_like(coord_mask), coord_mask)

    # Finalize (KerasYOLO.py:201-214)
    nb_coord_box = jnp.sum((coord_mask > 0.0).astype(jnp.float32))
    nb_conf_box = jnp.sum((conf_mask > 0.0).astype(jnp.float32))
    nb_class_box = jnp.sum((class_mask > 0.0).astype(jnp.float32))

    loss_xy = (jnp.sum(jnp.square(true_box_xy - pred_box_xy) * coord_mask)
               / (nb_coord_box + EPS) / 2.0)
    loss_wh = (jnp.sum(jnp.square(true_box_wh - pred_box_wh) * coord_mask)
               / (nb_coord_box + EPS) / 2.0)
    loss_conf = (jnp.sum(jnp.square(true_box_conf - pred_box_conf)
                         * conf_mask) / (nb_conf_box + EPS) / 2.0)
    ce = -jax.nn.log_softmax(pred_box_class, axis=-1)
    loss_class = jnp.take_along_axis(
        ce, true_box_class[..., None], axis=-1)[..., 0]
    loss_class = jnp.sum(loss_class * class_mask) / (nb_class_box + EPS)

    loss = loss_xy + loss_wh + loss_conf + loss_class

    # Recall telemetry (KerasYOLO.py:216-222) as aux metrics.
    nb_true_box = jnp.sum(objectness)
    nb_pred_box = jnp.sum((true_box_conf > 0.5).astype(jnp.float32)
                          * (pred_box_conf > 0.3).astype(jnp.float32))
    aux = {
        'loss_xy': loss_xy, 'loss_wh': loss_wh, 'loss_conf': loss_conf,
        'loss_class': loss_class, 'loss': loss,
        'recall': nb_pred_box / (nb_true_box + EPS),
    }
    return loss, aux


def binary_crossentropy(y_pred: jnp.ndarray, y_true: jnp.ndarray,
                        eps: float = 1e-7) -> jnp.ndarray:
    """Keras-style BCE on probabilities, mean over all elements — the
    TinyTracker objective (models_tracking/TinyTracker.py:40)."""
    p = jnp.clip(y_pred.astype(jnp.float32), eps, 1.0 - eps)
    t = y_true.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def heatmap_accuracy(y_pred: jnp.ndarray, y_true: jnp.ndarray,
                     eps: float = 1e-7) -> jnp.ndarray:
    """TinyHeatmapTracker's custom_acc: mean fraction of GT-on cells
    predicted on (models_tracking/TinyHeatmapTracker.py:28-31)."""
    positive = jnp.sum(y_true * y_pred, axis=-1)
    total = jnp.sum(y_true, axis=-1)
    return jnp.mean(positive / (total + eps))
