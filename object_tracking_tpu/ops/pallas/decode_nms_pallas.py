"""Fused YOLOv2 decode + greedy multi-class NMS in ONE Pallas kernel.

The production pipeline (ops/decode.decode_and_nms) is three device
stages: grid decode (VPU elementwise), a top-k candidate cap, and the
Pallas NMS kernel — each a separate fusion with HBM-visible
intermediates and its own launch. This kernel folds all of it into a
single VMEM-resident program over the FULL candidate lattice
(N = GH·GW·A = 845 for the 13×13×5 head):

- decode: sigmoid/softmax/threshold + the cell/anchor box build
  (reference semantics, /root/reference/utility/utils.py:208-236);
- NMS: the same early-exit greedy walk as nms_pallas.py, but over all N
  candidates — no top_k op at all (the cap exists in the staged pipeline
  only to shrink the NMS working set; in VMEM the full 845×845 IoU
  matrix is ~3 MB, well within budget).

Results are identical to the staged pipeline whenever the staged top-k
keeps every positive-score candidate (it does for any real
post-threshold set; both are exactly the reference walk).

Whether this fusion WINS is an empirical question —
benchmarks/profile_decode_nms.py measures it against the staged
pipeline and the decision is recorded in benchmarks/RESULTS.md
(SURVEY.md §7.8: measured-first Pallas).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(net_ref, lattice_ref, boxes_ref, scores_ref, *,
            grid_h: int, grid_w: int,
            obj_threshold: float, nms_threshold: float):
    net = net_ref[:]                           # (N, 5+C)
    lat = lattice_ref[:]                       # (N, 4) col,row,aw,ah

    # ---- decode (utils.py:214-236 semantics) --------------------------
    conf = jax.nn.sigmoid(net[:, 4])
    logits = net[:, 5:]
    e = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = conf[:, None] * (e / jnp.sum(e, axis=-1, keepdims=True))
    scores = probs * (probs > obj_threshold)

    x = (lat[:, 0] + jax.nn.sigmoid(net[:, 0])) / grid_w
    y = (lat[:, 1] + jax.nn.sigmoid(net[:, 1])) / grid_h
    w = lat[:, 2] * jnp.exp(net[:, 2]) / grid_w
    h = lat[:, 3] * jnp.exp(net[:, 3]) / grid_h

    # ---- full-lattice IoU ---------------------------------------------
    def overlap(center, size):
        lo = center - size * 0.5
        hi = center + size * 0.5
        return jnp.maximum(
            jnp.minimum(hi[:, None], hi[None, :])
            - jnp.maximum(lo[:, None], lo[None, :]), 0.0)

    inter = overlap(x, w) * overlap(y, h)
    area = w * h
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)    # (N, N)

    # ---- early-exit greedy NMS (same walk as nms_pallas.py) -----------
    n, c = scores.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, c), 0)

    def cond(carry):
        alive, done = carry
        return jnp.max(scores * alive * (1.0 - done)) > 0.0

    def body(carry):
        alive, done = carry
        cand = scores * alive * (1.0 - done)
        best = jnp.argmax(cand, axis=0)                        # (C,)
        active = (jnp.max(cand, axis=0) > 0.0).astype(scores.dtype)
        onehot = (row_ids == best[None, :]).astype(scores.dtype)
        sel_iou = jnp.dot(onehot.T, iou,
                          preferred_element_type=jnp.float32)  # (C, N)
        suppress = ((sel_iou.T >= nms_threshold).astype(scores.dtype)
                    * (1.0 - done) * (1.0 - onehot))
        alive = alive * (1.0 - suppress * active[None, :])
        done = jnp.minimum(done + onehot * active[None, :], 1.0)
        return alive, done

    ones = jnp.ones((n, c), scores.dtype)
    alive, _ = jax.lax.while_loop(cond, body,
                                  (ones, jnp.zeros_like(ones)))

    boxes_ref[:] = jnp.stack([x, y, w, h], axis=-1)
    scores_ref[:] = scores * alive


def decode_nms_fused(netout: jnp.ndarray, anchors,
                     obj_threshold: float = 0.5,
                     nms_threshold: float = 0.45,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """netout (GH, GW, A, 5+C) → (boxes (N, 4) center-format relative,
    scores (N, C) suppressed), N = GH·GW·A. One Pallas kernel.

    Not jitted itself — `anchors` must be a HOST array (np/list, never a
    traced value): the cell/anchor lattice is precomputed into a numpy
    constant so it embeds in the caller's jit as immediate data (the
    axon backend rejects fetching device arrays for constant embedding).
    Call it from inside your own jit.
    """
    gh, gw, na, d = netout.shape
    n = gh * gw * na
    anchors = np.asarray(anchors, np.float32).reshape(na, 2)
    col = np.tile(np.arange(gw, dtype=np.float32)[None, :, None],
                  (gh, 1, na))
    row = np.tile(np.arange(gh, dtype=np.float32)[:, None, None],
                  (1, gw, na))
    aw = np.tile(anchors[:, 0][None, None, :], (gh, gw, 1))
    ah = np.tile(anchors[:, 1][None, None, :], (gh, gw, 1))
    lattice = jnp.asarray(
        np.stack([col, row, aw, ah], -1).reshape(n, 4))

    return pl.pallas_call(
        functools.partial(_kernel, grid_h=gh, grid_w=gw,
                          obj_threshold=obj_threshold,
                          nms_threshold=nms_threshold),
        out_shape=(jax.ShapeDtypeStruct((n, 4), jnp.float32),
                   jax.ShapeDtypeStruct((n, d - 5), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(netout.astype(jnp.float32).reshape(n, d), lattice)
