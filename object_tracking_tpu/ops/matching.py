"""Track-identity assignment: IoU-cost matching between detection sets.

The reference has NO explicit ID assignment anywhere — trackids exist in
its converted XML and are dropped on parse (SURVEY.md §3.4); its
"tracking" output is temporally-smoothed boxes. A production tracker
needs identities, so this module provides:

- `greedy_match`: jittable fixed-shape greedy best-IoU matching
  (device-friendly, runs inside the jitted predict path);
- `hungarian_match`: optimal assignment on host via
  scipy.optimize.linear_sum_assignment (eval-time exactness);
- `TrackManager`: host-side track book-keeping (new IDs, misses,
  termination) over per-frame matches.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.ops.boxes import pairwise_iou_center


@functools.partial(jax.jit, static_argnames=('iou_threshold',))
def greedy_match(boxes_a: jnp.ndarray, valid_a: jnp.ndarray,
                 boxes_b: jnp.ndarray, valid_b: jnp.ndarray,
                 iou_threshold: float = 0.5) -> jnp.ndarray:
    """Greedy one-to-one matching by descending IoU.

    Args:
      boxes_a: (N, 4) center-format (e.g. previous-frame tracks).
      boxes_b: (M, 4) center-format (current detections).
      valid_a/valid_b: boolean masks.

    Returns:
      match: (M,) int32 — for each b-box, the matched a-index or -1.
    """
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    iou = pairwise_iou_center(boxes_a, boxes_b)          # (N, M)
    iou = jnp.where(valid_a[:, None] & valid_b[None, :], iou, -1.0)

    def body(_, carry):
        iou_c, match = carry
        flat = jnp.argmax(iou_c)
        i, j = flat // m, flat % m
        best = iou_c[i, j]
        ok = best >= iou_threshold
        match = jnp.where(ok, match.at[j].set(i.astype(jnp.int32)),
                          match)
        # retire row i and column j
        iou_c = jnp.where(ok, iou_c.at[i, :].set(-1.0), iou_c)
        iou_c = jnp.where(ok, iou_c.at[:, j].set(-1.0), iou_c)
        return iou_c, match

    _, match = jax.lax.fori_loop(
        0, min(n, m), body,
        (iou, jnp.full((m,), -1, jnp.int32)))
    return match


def hungarian_match(boxes_a: np.ndarray, boxes_b: np.ndarray,
                    iou_threshold: float = 0.5,
                    labels_a: Optional[np.ndarray] = None,
                    labels_b: Optional[np.ndarray] = None
                    ) -> List[Tuple[int, int]]:
    """Optimal IoU assignment (host, scipy). Returns [(i_a, i_b), ...].

    When labels are given, cross-class pairs are excluded (their IoU is
    forced below any threshold), so a detection can only extend a track
    of its own class.
    """
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return []
    from scipy.optimize import linear_sum_assignment
    iou = np.asarray(pairwise_iou_center(
        jnp.asarray(boxes_a, jnp.float32),
        jnp.asarray(boxes_b, jnp.float32)))
    if labels_a is not None and labels_b is not None:
        same = np.asarray(labels_a)[:, None] == np.asarray(labels_b)[None, :]
        iou = np.where(same, iou, -1.0)
    rows, cols = linear_sum_assignment(-iou)
    return [(int(r), int(c)) for r, c in zip(rows, cols)
            if iou[r, c] >= iou_threshold]


class TrackManager:
    """Host-side identity book-keeping over per-frame detections.

    update() matches current detections to live tracks (Hungarian on
    IoU), assigns new IDs to unmatched detections, and retires tracks
    unseen for `max_age` frames.
    """

    def __init__(self, iou_threshold: float = 0.5, max_age: int = 3):
        self.iou_threshold = iou_threshold
        self.max_age = max_age
        self._next_id = 0
        self._tracks: Dict[int, np.ndarray] = {}     # id → last box
        self._labels: Dict[int, int] = {}            # id → class id
        self._age: Dict[int, int] = {}

    def reset(self) -> None:
        self._next_id = 0
        self._tracks.clear()
        self._labels.clear()
        self._age.clear()

    def update(self, boxes: np.ndarray,
               labels: Optional[np.ndarray] = None) -> List[int]:
        """boxes (M, 4) center-format → per-detection track ids.

        When `labels` (M,) class ids are given, matching is class-aware:
        a detection never continues a track of a different class.
        """
        ids = list(self._tracks.keys())
        prev = np.stack([self._tracks[i] for i in ids]) if ids else \
            np.zeros((0, 4), np.float32)
        prev_labels = None
        if labels is not None and ids:
            prev_labels = np.asarray(
                [self._labels.get(i, -1) for i in ids])
        pairs = hungarian_match(
            prev, boxes, self.iou_threshold,
            labels_a=prev_labels,
            labels_b=np.asarray(labels) if labels is not None and ids
            else None)
        matched_b = {b: ids[a] for a, b in pairs}
        out = []
        seen = set()
        for j in range(len(boxes)):
            if j in matched_b:
                tid = matched_b[j]
            else:
                tid = self._next_id
                self._next_id += 1
            out.append(tid)
            seen.add(tid)
            self._tracks[tid] = np.asarray(boxes[j], np.float32)
            if labels is not None:
                self._labels[tid] = int(np.asarray(labels)[j])
            self._age[tid] = 0
        for tid in list(self._tracks):
            if tid not in seen:
                self._age[tid] += 1
                if self._age[tid] > self.max_age:
                    del self._tracks[tid], self._age[tid]
                    self._labels.pop(tid, None)
        return out
