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
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.config import TRACK_GATE_IOU
from object_tracking_tpu.ops.boxes import pairwise_iou_center


@functools.partial(jax.jit, static_argnames=('iou_threshold',))
def greedy_match(boxes_a: jnp.ndarray, valid_a: jnp.ndarray,
                 boxes_b: jnp.ndarray, valid_b: jnp.ndarray,
                 iou_threshold: float = TRACK_GATE_IOU) -> jnp.ndarray:
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


class TrackState(NamedTuple):
    """Fixed-shape, device-resident track table for jitted identity
    assignment — the in-jit counterpart of the host TrackManager. All
    arrays are length MAX_TRACKS (slot-indexed); `ids` holds the public
    track id of each slot, `age` the frames since last match, `vel` the
    EMA of the per-frame center displacement (constant-velocity motion
    model: matching happens against the motion-PREDICTED box, and
    unmatched tracks coast along their velocity — without it a track
    whose object moves during a missed/occluded frame is re-acquired
    below the IoU gate and switches identity; crossing objects also
    greedily swap, since stale boxes overlap the wrong detection)."""
    boxes: jnp.ndarray     # (S, 4) center-format
    vel: jnp.ndarray       # (S, 2) center velocity / frame
    labels: jnp.ndarray    # (S,) int32 class ids
    ids: jnp.ndarray       # (S,) int32 public ids (-1 = unused slot)
    age: jnp.ndarray       # (S,) int32
    active: jnp.ndarray    # (S,) bool
    next_id: jnp.ndarray   # () int32


def init_track_state(max_tracks: int = 64) -> TrackState:
    s = max_tracks
    return TrackState(
        boxes=jnp.zeros((s, 4), jnp.float32),
        vel=jnp.zeros((s, 2), jnp.float32),
        labels=jnp.full((s,), -1, jnp.int32),
        ids=jnp.full((s,), -1, jnp.int32),
        age=jnp.zeros((s,), jnp.int32),
        active=jnp.zeros((s,), bool),
        next_id=jnp.int32(0))


def assign_tracks(state: TrackState, boxes: jnp.ndarray,
                  labels: jnp.ndarray, valid: jnp.ndarray,
                  iou_threshold: float = TRACK_GATE_IOU, max_age: int = 3,
                  vel_smooth: float = 0.6
                  ) -> Tuple[TrackState, jnp.ndarray]:
    """One frame of class-aware, motion-aware greedy track assignment,
    fully jittable.

    Matches current detections to live tracks by descending IoU against
    each track's constant-velocity PREDICTED box (SORT-style; see
    TrackState.vel), assigns fresh ids to unmatched detections (into
    free slots; when the table is full the excess detections get id -1),
    ages unmatched tracks — which coast along their velocity so a
    reappearing object still overlaps its track — and retires those
    unseen for > max_age frames. TrackManager.update semantics as a pure
    fixed-shape function, so identity assignment runs INSIDE the jitted
    predict program instead of a host round-trip per frame.

    Returns (new_state, det_ids (M,) int32 — -1 for invalid detections).
    """
    s = state.boxes.shape[0]
    m = boxes.shape[0]
    pred_boxes = state.boxes.at[:, :2].add(state.vel)        # (S, 4)
    iou = pairwise_iou_center(pred_boxes, boxes)             # (S, M)
    ok = (state.active[:, None] & valid[None, :]
          & (state.labels[:, None] == labels[None, :]))
    iou = jnp.where(ok, iou, -1.0)

    def body(_, carry):
        iou_c, match = carry
        flat = jnp.argmax(iou_c)
        i, j = flat // m, flat % m
        hit = iou_c[i, j] >= iou_threshold
        match = jnp.where(hit, match.at[j].set(i.astype(jnp.int32)),
                          match)
        iou_c = jnp.where(hit, iou_c.at[i, :].set(-1.0), iou_c)
        iou_c = jnp.where(hit, iou_c.at[:, j].set(-1.0), iou_c)
        return iou_c, match

    _, match = jax.lax.fori_loop(
        0, min(s, m), body, (iou, jnp.full((m,), -1, jnp.int32)))

    matched_det = match >= 0                                  # (M,)
    slot_of_det = jnp.where(matched_det, match, 0)
    # which slots got matched this frame (max: duplicate index 0 writes
    # from unmatched dets must not clobber a real hit there)
    slot_hit = jnp.zeros((s,), bool).at[slot_of_det].max(
        matched_det, mode='drop')

    # age/retire unmatched tracks first, freeing their slots
    age = jnp.where(slot_hit, 0, state.age + 1)
    active = state.active & (age <= max_age)

    # allocate free slots to new (valid, unmatched) detections in order
    new_det = valid & ~matched_det                            # (M,)
    free = ~active                                            # (S,)
    # rank of each new det among new dets / of each free slot among free
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1      # (M,)
    free_slots = jnp.nonzero(free, size=s, fill_value=-1)[0]  # (S,)
    n_free = jnp.sum(free.astype(jnp.int32))
    placeable = new_det & (det_rank < n_free)
    new_slot = jnp.where(placeable,
                         free_slots[jnp.clip(det_rank, 0, s - 1)], -1)

    # ids: matched dets inherit the slot id; placeable dets get fresh ids
    fresh_id = state.next_id + det_rank
    det_ids = jnp.where(matched_det, state.ids[slot_of_det], -1)
    det_ids = jnp.where(placeable, fresh_id, det_ids)

    # scatter detection data into slots (matched updates + new inserts);
    # non-writing detections point out of bounds and are dropped —
    # routing them to any real slot would clobber it (duplicate-index
    # scatter order is undefined)
    write = matched_det | placeable
    slot = jnp.where(write, jnp.where(matched_det, slot_of_det, new_slot),
                     s)
    # unmatched live tracks coast along their velocity (so a track hidden
    # for k frames sits ~where its object reappears); matched slots are
    # overwritten with the detection below
    coast = jnp.where((state.active & ~slot_hit)[:, None],
                      pred_boxes, state.boxes)
    new_boxes = coast.at[slot].set(boxes, mode='drop')
    # EMA velocity for matched tracks; fresh tracks start at rest. A
    # track still at rest bootstraps to the full observed displacement
    # (EMA from zero would lag ~1/vel_smooth frames behind a constant
    # velocity — enough to miss a re-acquisition after an occlusion).
    inst_vel = boxes[:, :2] - state.boxes[slot_of_det, :2]
    prev_vel = state.vel[slot_of_det]
    at_rest = jnp.all(prev_vel == 0.0, axis=-1, keepdims=True)
    ema = vel_smooth * inst_vel + (1.0 - vel_smooth) * prev_vel
    det_vel = jnp.where(matched_det[:, None],
                        jnp.where(at_rest, inst_vel, ema), 0.0)
    new_vel = state.vel.at[slot].set(det_vel, mode='drop')
    new_labels = state.labels.at[slot].set(labels, mode='drop')
    new_ids = state.ids.at[slot].set(det_ids, mode='drop')
    age = age.at[slot].set(0, mode='drop')
    active = active.at[slot].set(True, mode='drop')

    new_state = TrackState(
        boxes=new_boxes, vel=new_vel, labels=new_labels, ids=new_ids,
        age=age, active=active,
        next_id=state.next_id + jnp.sum(placeable.astype(jnp.int32)))
    return new_state, det_ids


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
    IoU against each track's constant-velocity PREDICTED box — the same
    SORT-style motion model as the in-jit TrackState), assigns new IDs
    to unmatched detections, coasts unmatched tracks along their
    velocity, and retires tracks unseen for `max_age` frames.
    """

    def __init__(self, iou_threshold: float = TRACK_GATE_IOU,
                 max_age: int = 3, vel_smooth: float = 0.6):
        self.iou_threshold = iou_threshold
        self.max_age = max_age
        self.vel_smooth = vel_smooth
        self._next_id = 0
        self._tracks: Dict[int, np.ndarray] = {}     # id → last box
        self._vel: Dict[int, np.ndarray] = {}        # id → center vel
        self._labels: Dict[int, int] = {}            # id → class id
        self._age: Dict[int, int] = {}

    def reset(self) -> None:
        self._next_id = 0
        self._tracks.clear()
        self._vel.clear()
        self._labels.clear()
        self._age.clear()

    def _predicted(self, tid: int) -> np.ndarray:
        box = self._tracks[tid].copy()
        box[:2] += self._vel.get(tid, 0.0)
        return box

    def update(self, boxes: np.ndarray,
               labels: Optional[np.ndarray] = None) -> List[int]:
        """boxes (M, 4) center-format → per-detection track ids.

        When `labels` (M,) class ids are given, matching is class-aware:
        a detection never continues a track of a different class.
        """
        ids = list(self._tracks.keys())
        prev = np.stack([self._predicted(i) for i in ids]) if ids else \
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
                inst = np.asarray(boxes[j], np.float32)[:2] \
                    - self._tracks[tid][:2]
                prev = self._vel.get(tid, np.zeros(2, np.float32))
                # bootstrap a track at rest to the full displacement
                # (EMA from zero lags a constant velocity too far to
                # re-acquire after an occlusion gap)
                self._vel[tid] = inst if not prev.any() else (
                    self.vel_smooth * inst
                    + (1.0 - self.vel_smooth) * prev)
            else:
                tid = self._next_id
                self._next_id += 1
                self._vel[tid] = np.zeros(2, np.float32)
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
                    self._vel.pop(tid, None)
                else:
                    # coast: next frame's match happens against the
                    # position the object should have reached
                    self._tracks[tid] = self._predicted(tid)
        return out
