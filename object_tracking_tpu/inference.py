"""Inference wrappers: joint detect+track over video windows, with IDs.

Fixes and extends the reference's `MultiObjDetTracker.predict`
(/root/reference/models_tracking/MultiObjDetTracker.py:295-315 — which
crashes on an undefined `image_path` and a wrong-rank true-box input,
SURVEY.md §4):

- one jitted program runs the whole window: model forward + per-frame
  decode+NMS on device (the reference pulls the netout to host and
  decodes in Python per frame);
- the tracking head's boxes get explicit identities via IoU matching
  (ops/matching.py) — a capability the reference lacks entirely;
- streaming mode: `lax.scan`-style carry of ConvLSTM state is implicit in
  the model's nn.RNN; long clips go through `predict_video` in windows.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.config import (
    TRACK_GATE_IOU, DetectorConfig, JointConfig)
from object_tracking_tpu.ops.decode import boxes_to_list, decode_and_nms
from object_tracking_tpu.ops.matching import (
    TrackManager, assign_tracks, init_track_state)


class JointPredictor:
    """Runs a trained MultiObjDetTracker over frame windows."""

    def __init__(self, model, variables, anchors,
                 labels: Sequence[str],
                 obj_threshold: float = 0.5,
                 nms_threshold: float = 0.45,
                 head: str = 'track',        # reference uses the tracking
                                             # head output (:307)
                 # Track-association gate (NOT the NMS/eval threshold);
                 # shared constant — see config.TRACK_GATE_IOU for why
                 # 0.3 (ADVICE r3: one value across all layers).
                 iou_threshold: float = TRACK_GATE_IOU,
                 net_size: Tuple[int, int] = (416, 416),
                 bn_mode: str = 'batch',     # 'batch' = reference parity
                                             # (K.set_learning_phase(1)
                                             # keeps BN on batch stats at
                                             # predict time too);
                                             # 'running' = EMA stats
                 matcher: str = 'greedy',    # 'greedy' = identity
                                             # assignment INSIDE the jit
                                             # (ops/matching.assign_tracks,
                                             # no host round-trip per
                                             # frame); 'hungarian' = host
                                             # scipy optimum (eval)
                 max_tracks: int = 64,
                 max_age: int = 3):
        self.model = model
        self.variables = variables
        # Host-side on purpose: `_run` (jit) closes over this, and a
        # device array would be fetched back for constant embedding —
        # which the axon TPU backend rejects.
        self.anchors = np.asarray(anchors, np.float32)
        self.labels = tuple(labels)
        self.head = head
        self.net_h, self.net_w = net_size
        if matcher not in ('greedy', 'hungarian'):
            raise ValueError(matcher)
        self.matcher = matcher
        self.max_tracks = max_tracks
        self.tracks = TrackManager(iou_threshold=iou_threshold,
                                   max_age=max_age)
        self._state = None                  # carried ConvLSTM (c, h)
        self._track_state = None            # carried device TrackState

        batch_bn = bn_mode == 'batch'
        greedy = matcher == 'greedy'

        @jax.jit
        def _run(variables, images, state, track_state):
            out = self.model.apply(variables, images, train=batch_bn,
                                   initial_state=state,
                                   return_state=True,
                                   mutable=['batch_stats']
                                   if batch_bn else False)
            if batch_bn:
                out, _ = out            # discard stat updates
            netout = out[head][0]            # (T, GH, GW, A, 5+C)
            dets = jax.vmap(lambda n: decode_and_nms(
                n, self.anchors, obj_threshold=obj_threshold,
                nms_threshold=nms_threshold))(netout)
            if greedy:
                def frame(ts, det):
                    boxes, det_labels, _scores, valid = det
                    ts, ids = assign_tracks(
                        ts, boxes, det_labels.astype(jnp.int32), valid,
                        iou_threshold=iou_threshold, max_age=max_age)
                    return ts, ids
                track_state, ids = jax.lax.scan(frame, track_state, dets)
            else:
                ids = None
            # f32 carry keeps the jit signature stable across windows
            # whatever the model's compute dtype.
            state = jax.tree_util.tree_map(
                lambda s: s.astype(jnp.float32), out['state'])
            return dets, ids, state, track_state

        self._run = _run

        # Batched-serving twin: B independent clip streams in ONE
        # program — decode vmapped over (B, T), identity assignment a
        # per-clip scan vmapped over B. Measured on the real chip the
        # joint program runs 2.4x more frames/sec at B=32 than at B=1
        # (benchmarks/RESULTS.md MFU table: 0.703 vs 0.291 MFU,
        # saturating at B=32), so serving wants this path whenever
        # clips can be batched.
        @jax.jit
        def _run_batch(variables, images, state, track_state):
            out = self.model.apply(variables, images, train=batch_bn,
                                   initial_state=state,
                                   return_state=True,
                                   mutable=['batch_stats']
                                   if batch_bn else False)
            if batch_bn:
                out, _ = out
            netout = out[head]               # (B, T, GH, GW, A, 5+C)
            dets = jax.vmap(jax.vmap(lambda n: decode_and_nms(
                n, self.anchors, obj_threshold=obj_threshold,
                nms_threshold=nms_threshold)))(netout)
            if greedy:
                def frame(ts, det):
                    boxes, det_labels, _scores, valid = det
                    ts, ids = assign_tracks(
                        ts, boxes, det_labels.astype(jnp.int32), valid,
                        iou_threshold=iou_threshold, max_age=max_age)
                    return ts, ids

                def clip(ts, det_seq):
                    return jax.lax.scan(frame, ts, det_seq)
                track_state, ids = jax.vmap(clip)(track_state, dets)
            else:
                ids = None
            state = jax.tree_util.tree_map(
                lambda s: s.astype(jnp.float32), out['state'])
            return dets, ids, state, track_state

        self._run_batch = _run_batch

    def _load_window(self, paths: Sequence[str]) -> np.ndarray:
        import cv2
        frames = []
        for p in paths:
            img = cv2.imread(p)
            if img is None:
                raise FileNotFoundError(p)
            img = cv2.resize(img, (self.net_w, self.net_h))[:, :, ::-1]
            frames.append(np.asarray(img, np.float32) / 255.0)
        return np.stack(frames)[None]        # (1, T, H, W, 3)

    def reset_state(self) -> None:
        """Drop the carried ConvLSTM state (and track identities) so the
        next window starts a fresh, independent clip."""
        self._state = None
        self._track_state = None
        self.tracks.reset()

    def predict_window(self, frames) -> List[List[dict]]:
        """frames: list of image paths OR array (T, H, W, 3) in [0,1].

        Returns per frame: [{'label', 'score', 'box' (cx,cy,w,h) rel,
        'track_id'}, ...].

        NOTE: consecutive calls are a streaming continuation — the
        ConvLSTM state carries across windows (that is the point of the
        streaming design). Call `reset_state()` between unrelated clips;
        a batch-size change resets automatically.
        """
        if isinstance(frames[0], str):
            x = self._load_window(frames)
        else:
            x = np.asarray(frames, np.float32)[None]
        if self._state is not None and \
                jax.tree_util.tree_leaves(self._state)[0].shape[0] \
                != x.shape[0]:
            self.reset_state()
        if self._state is None:
            b = x.shape[0]
            gh, gw = self.net_h // 32, self.net_w // 32
            if hasattr(self.model, 'zero_state'):
                self._state = self.model.zero_state(b, gh, gw)
            else:
                feats = self.model.convlstm_features
                zeros = jnp.zeros((b, gh, gw, feats), jnp.float32)
                self._state = (zeros, zeros)
        if self._track_state is None:
            self._track_state = init_track_state(self.max_tracks)
        (boxes, labels, scores, valid), dev_ids, self._state, \
            self._track_state = self._run(
                self.variables, x, self._state, self._track_state)
        if dev_ids is not None:
            dev_ids = np.asarray(dev_ids)
        out = []
        for t in range(x.shape[1]):
            if dev_ids is not None:
                # device-side identities: align ids with the same
                # valid-filter + score sort boxes_to_list applies
                v = np.asarray(valid[t])
                # stable sort matches boxes_to_list's `sorted` on ties
                order = np.argsort(-np.asarray(scores[t])[v],
                                   kind='stable')
                dets = boxes_to_list(boxes[t], labels[t], scores[t],
                                     valid[t])
                ids = list(dev_ids[t][v][order])
            else:
                dets = boxes_to_list(boxes[t], labels[t], scores[t],
                                     valid[t])
                det_boxes = np.asarray([d[2] for d in dets], np.float32) \
                    if dets else np.zeros((0, 4), np.float32)
                det_labels = np.asarray([d[0] for d in dets], np.int32) \
                    if dets else np.zeros((0,), np.int32)
                ids = self.tracks.update(det_boxes, labels=det_labels)
            out.append([
                {'label': self.labels[l] if l < len(self.labels)
                 else str(l),
                 'score': s, 'box': b, 'track_id': int(ids[i])}
                for i, (l, s, b) in enumerate(dets)])
        return out

    def _unpack_frames(self, boxes, labels, scores, valid, dev_ids,
                       tracks: Optional[TrackManager] = None):
        """Per-frame detection dicts for one clip's (T, ...) outputs."""
        out = []
        for t in range(boxes.shape[0]):
            if dev_ids is not None:
                v = np.asarray(valid[t])
                order = np.argsort(-np.asarray(scores[t])[v],
                                   kind='stable')
                dets = boxes_to_list(boxes[t], labels[t], scores[t],
                                     valid[t])
                ids = list(np.asarray(dev_ids[t])[v][order])
            else:
                dets = boxes_to_list(boxes[t], labels[t], scores[t],
                                     valid[t])
                det_boxes = np.asarray([d[2] for d in dets], np.float32) \
                    if dets else np.zeros((0, 4), np.float32)
                det_labels = np.asarray([d[0] for d in dets], np.int32) \
                    if dets else np.zeros((0,), np.int32)
                ids = (tracks or self.tracks).update(det_boxes,
                                                     labels=det_labels)
            out.append([
                {'label': self.labels[l] if l < len(self.labels)
                 else str(l),
                 'score': s, 'box': b, 'track_id': int(ids[i])}
                for i, (l, s, b) in enumerate(dets)])
        return out

    def reset_batch_state(self) -> None:
        """Drop all batched streams' carried state."""
        self._bstate = None
        self._btrack_state = None

    def predict_batch(self, clips) -> List[List[List[dict]]]:
        """B INDEPENDENT clip streams in one device program.

        clips: (B, T, H, W, 3) float32 in [0, 1]. Returns per clip the
        same per-frame structure as `predict_window`. Consecutive calls
        stream: clip i's ConvLSTM + track state carries to the next
        call's clip i (a batch-size change resets all streams).

        Use this for serving whenever clips can be batched: the joint
        clip program measured 2.0x the B=1 frames/sec at B=16 on one
        chip (RESULTS.md MFU table — the sequential ConvLSTM step
        under-fills the MXU at B=1). Requires matcher='greedy'
        (identity assignment stays inside the jit, vmapped per clip).
        Note: bn_mode='batch' (reference parity) computes BatchNorm
        statistics over the WHOLE batch, weakly coupling streams;
        bn_mode='running' keeps them exactly independent.
        """
        if self.matcher != 'greedy':
            raise ValueError(
                'predict_batch requires matcher="greedy" (the host '
                'Hungarian path is per-stream)')
        x = np.asarray(clips, np.float32)
        b = x.shape[0]
        if getattr(self, '_bstate', None) is not None and \
                jax.tree_util.tree_leaves(
                    self._bstate)[0].shape[0] != b:
            self.reset_batch_state()
        if getattr(self, '_bstate', None) is None:
            gh, gw = self.net_h // 32, self.net_w // 32
            if hasattr(self.model, 'zero_state'):
                self._bstate = self.model.zero_state(b, gh, gw)
            else:
                feats = self.model.convlstm_features
                zeros = jnp.zeros((b, gh, gw, feats), jnp.float32)
                self._bstate = (zeros, zeros)
            self._btrack_state = jax.vmap(
                lambda _: init_track_state(self.max_tracks))(
                jnp.arange(b))
        (boxes, labels, scores, valid), dev_ids, self._bstate, \
            self._btrack_state = self._run_batch(
                self.variables, x, self._bstate, self._btrack_state)
        dev_ids = np.asarray(dev_ids)
        return [self._unpack_frames(boxes[i], labels[i], scores[i],
                                    valid[i], dev_ids[i])
                for i in range(b)]

    def predict_video(self, paths: Sequence[str], window: int = 4,
                      draw_dir: Optional[str] = None
                      ) -> List[List[dict]]:
        """Stride through a full clip in windows. Track IDs persist via
        the TrackManager carry AND the ConvLSTM state streams across
        window boundaries (the reference restarts its recurrent state
        every window, MultiObjDetTracker.py:295-315)."""
        self.reset_state()
        results: List[List[dict]] = []
        for start in range(0, len(paths), window):
            chunk = list(paths[start:start + window])
            tail = len(chunk)
            if tail < window:
                # Pad the final partial window by repeating the last frame
                # (keeps the jitted window shape fixed), then trim the
                # padded predictions — no frame is silently dropped.
                chunk = chunk + [chunk[-1]] * (window - tail)
            results.extend(self.predict_window(chunk)[:tail])
        if draw_dir:
            self._draw(paths[:len(results)], results, draw_dir)
        return results

    def _draw(self, paths, results, out_dir: str) -> None:
        import os

        import cv2
        os.makedirs(out_dir, exist_ok=True)
        colors: dict = {}

        def track_color(tid: int):
            # deterministic per-track color, computed once per track
            # (not once per box per frame)
            if tid not in colors:
                colors[tid] = tuple(int(c) for c in np.random.RandomState(
                    tid).randint(0, 255, 3))
            return colors[tid]

        for p, dets in zip(paths, results):
            img = cv2.imread(p)
            ih, iw = img.shape[:2]
            for d in dets:
                cx, cy, w, h = d['box']
                x1, y1 = int((cx - w / 2) * iw), int((cy - h / 2) * ih)
                x2, y2 = int((cx + w / 2) * iw), int((cy + h / 2) * ih)
                color = track_color(d['track_id'])
                cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
                cv2.putText(img, f"#{d['track_id']} {d['label']}",
                            (x1, y1 - 5), cv2.FONT_HERSHEY_SIMPLEX,
                            0.5, color, 1)
            cv2.imwrite(os.path.join(
                out_dir, os.path.basename(p)), img)
