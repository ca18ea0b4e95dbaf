"""On-device YOLOv2 netout decoding: grid decode → threshold → NMS.

Replaces the host-side, in-place-mutating decode loop of the reference
(/root/reference/utility/utils.py:208-257 `decode_netout`):

1. conf = sigmoid(netout[..., 4])                       (utils.py:214)
2. class scores = conf * softmax(netout[..., 5:])       (utils.py:215)
3. zero class scores <= obj_threshold                   (utils.py:216)
4. box decode: x=(col+sigmoid(tx))/W, y=(row+sigmoid(ty))/H,
   w=anchor_w*exp(tw)/W, h=anchor_h*exp(th)/H           (utils.py:228-231)
5. per-class greedy NMS                                  (utils.py:239-252)
6. keep boxes whose best class score > obj_threshold     (utils.py:255)

Everything is vectorized over the full (H, W, A) lattice — no per-cell
Python loop — and stays fixed-shape so it jits, vmaps over batch/time, and
fuses into the detector forward. The reference's `softmax` carries a
logit-rescaling guard for values < -100 (utils.py:262-270); we use the
standard max-subtracted softmax (identical in the guard-free regime).

Final results are padded arrays + a validity mask; `boxes_to_list`
converts to host-side tuples for drawing/IO parity.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.ops.nms import greedy_nms_scores


def decode_netout(netout: jnp.ndarray, anchors,
                  obj_threshold: float = 0.5):
    """Decode a raw (H, W, A, 5+C) netout into flat candidates.

    Returns:
      boxes: (H*W*A, 4) center-format, image-relative [0, 1].
      scores: (H*W*A, C) thresholded class scores (conf * softmax).
    """
    grid_h, grid_w, num_anchors = netout.shape[:3]
    anchors = jnp.asarray(anchors, jnp.float32).reshape(num_anchors, 2)

    conf = jax.nn.sigmoid(netout[..., 4:5])
    probs = conf * jax.nn.softmax(netout[..., 5:], axis=-1)
    probs = probs * (probs > obj_threshold)

    col = jax.lax.broadcasted_iota(jnp.float32,
                                   (grid_h, grid_w, num_anchors), 1)
    row = jax.lax.broadcasted_iota(jnp.float32,
                                   (grid_h, grid_w, num_anchors), 0)
    x = (col + jax.nn.sigmoid(netout[..., 0])) / grid_w
    y = (row + jax.nn.sigmoid(netout[..., 1])) / grid_h
    w = anchors[None, None, :, 0] * jnp.exp(netout[..., 2]) / grid_w
    h = anchors[None, None, :, 1] * jnp.exp(netout[..., 3]) / grid_h

    boxes = jnp.stack([x, y, w, h], axis=-1).reshape(-1, 4)
    scores = probs.reshape(-1, probs.shape[-1])
    return boxes, scores


@functools.partial(
    jax.jit,
    static_argnames=('obj_threshold', 'nms_threshold', 'top_k',
                     'nms_impl'))
def decode_and_nms(netout: jnp.ndarray, anchors: jnp.ndarray,
                   obj_threshold: float = 0.5,
                   nms_threshold: float = 0.45,
                   top_k: int = 128,
                   nms_impl: str = 'auto'):
    """Full decode+NMS. netout (H, W, A, 5+C) →
    (boxes (K, 4), labels (K,), scores (K,), valid (K,)).

    A candidate survives iff its best class score after NMS exceeds
    obj_threshold (utils.py:255 keeps `get_score() > obj_threshold`).

    `nms_impl` forwards to `greedy_nms_scores` — serving export needs
    the portable pure-XLA 'sort' (Pallas custom calls don't lower for
    every `jax.export` target platform).
    """
    boxes, scores = decode_netout(netout, anchors, obj_threshold)
    boxes, scores = greedy_nms_scores(boxes, scores, nms_threshold,
                                      top_k, impl=nms_impl)
    labels = jnp.argmax(scores, axis=-1)
    best = jnp.max(scores, axis=-1)
    valid = best > obj_threshold
    return boxes, labels, best, valid


def boxes_to_list(boxes, labels, scores, valid) -> List[Tuple]:
    """Host conversion: padded device results → [(label_idx, score,
    (cx, cy, w, h)), ...] sorted by score, mirroring the tuple surface of
    the darknet wrapper (models_detection/YOLO.py:152-159)."""
    boxes, labels, scores, valid = map(np.asarray,
                                       (boxes, labels, scores, valid))
    out = [(int(l), float(s), tuple(map(float, b)))
           for b, l, s, v in zip(boxes, labels, scores, valid) if v]
    return sorted(out, key=lambda r: -r[1])
