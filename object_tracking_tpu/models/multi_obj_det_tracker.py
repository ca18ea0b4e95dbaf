"""Joint multi-object detection + tracking model.

Re-designs models_tracking/MultiObjDetTracker.py:160-189 as one pure flax
module:

- the shared YOLOv2 detector runs over every frame by folding time into the
  batch axis (B·T) — the MXU-friendly equivalent of Keras TimeDistributed
  wrapping (MultiObjDetTracker.py:166-171), and strictly better on TPU: one
  big conv batch instead of T small ones;
- detection head = the per-frame netout reshaped to (B, T, GH, GW, A, 5+C)
  (MultiObjDetTracker.py:173);
- tracking head = concat(head activations, conv_feat) → ConvLSTM(512, 3x3)
  scanned over time via nn.RNN/lax.scan (O(1) memory in T, enabling long
  clips; MultiObjDetTracker.py:175-176) → 1x1 conv to A·(5+C)
  (MultiObjDetTracker.py:182-183);
- the reference's true-box passthrough Lambda inputs
  (MultiObjDetTracker.py:185-186) disappear: losses are pure functions
  here, so no graph-side side-channel is needed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from object_tracking_tpu.models.convlstm import FusedConvLSTM
from object_tracking_tpu.models.darknet19 import Darknet19


class MultiObjDetTracker(nn.Module):
    num_classes: int = 12     # MOT17 label set (MultiObjDetTracker.py:82)
    num_anchors: int = 5
    convlstm_features: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images (B, T, H, W, 3) in [0, 1] →
        {'detect': (B, T, GH, GW, A, 5+C), 'track': same}."""
        b, t, h, w, c = images.shape
        flat = images.reshape(b * t, h, w, c)

        det = Darknet19(num_classes=self.num_classes,
                        num_anchors=self.num_anchors,
                        dtype=self.dtype, name='detector')(flat, train)
        gh, gw = det['netout'].shape[1:3]
        out_ch = self.num_anchors * (5 + self.num_classes)

        detect = det['netout'].reshape(
            b, t, gh, gw, self.num_anchors, 5 + self.num_classes)

        # Tracking branch input: concat(bbox branch, visual features)
        # (MultiObjDetTracker.py:175). Keras concatenates the *flat* conv_23
        # output (GH, GW, A·(5+C)) with conv_feat (GH, GW, 1024).
        x_bbox = det['netout'].reshape(b, t, gh, gw, out_ch)
        x_vis = det['conv_feat'].reshape(b, t, gh, gw, -1)
        z = jnp.concatenate([x_bbox, x_vis], axis=-1).astype(self.dtype)

        # Split-projection ConvLSTM: input conv MXU-batched over B·T, only
        # the recurrent conv + fused gates stay in the sequential scan
        # (models/convlstm.py; Keras ConvLSTM2D equivalent).
        z = FusedConvLSTM(self.convlstm_features, (3, 3),
                          dtype=self.dtype, name='tconv_lstm')(z)

        z = nn.Conv(out_ch, (1, 1), padding='SAME', dtype=self.dtype,
                    kernel_init=nn.initializers.lecun_normal(),
                    name='tconv_2')(z)
        track = z.reshape(b, t, gh, gw, self.num_anchors,
                          5 + self.num_classes).astype(jnp.float32)
        return {'track': track, 'detect': detect}
