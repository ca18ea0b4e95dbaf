"""Darknet-19 / YOLOv2 detector as a pure flax module.

Re-designs the Keras graph of the reference
(/root/reference/models_detection/KerasYOLO.py:277-407): 22 conv+BN+
LeakyReLU(0.1) blocks with 5 max-pools, a space-to-depth skip from block 13,
and a 1x1 head conv reshaped to (H/32, W/32, A, 5+C).

TPU-first choices:
- NHWC layout and (optionally) bfloat16 compute so every conv tiles onto
  the MXU; params stay float32.
- The module returns BOTH the head netout and the `conv_feat` activation in
  one forward — the reference rebuilds a second Keras model to get the two
  taps (MultiObjDetTracker.py:162-164); here it's a single fused program.
- BatchNorm uses Keras' epsilon (1e-3) and momentum (0.99) so darknet
  `.weights` statistics reproduce the reference's inference outputs.
- `space_to_depth` follows tf.space_to_depth channel order (block-position
  major), matching the reference's Lambda (KerasYOLO.py:241-242, 389).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


def space_to_depth_2x(x: jnp.ndarray) -> jnp.ndarray:
    """tf.space_to_depth(block_size=2) on NHWC: channel order (di, dj, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


class Darknet19(nn.Module):
    """YOLOv2 backbone + detection head.

    Attributes:
      num_classes: size of the class set (defines head width).
      num_anchors: anchor boxes per cell.
      dtype: activation dtype (bfloat16 for MXU throughput, float32 for
        parity tests). Params are always float32.
    """
    num_classes: int = 80
    num_anchors: int = 5
    dtype: Any = jnp.float32
    # Divide every backbone channel width by this (floor 4). Topology,
    # taps, pool plan, and the space-to-depth skip are unchanged, so a
    # width-divided model preserves every structural and sharding
    # property of the full one at a fraction of the FLOPs — the same
    # fixture-scale trick as models/vgg16.py `width_div` (used by the
    # committed golden fixture) and the multi-chip dry run.
    width_div: int = 1

    # (conv index, features, kernel) with pools after 1, 2, 5, 8, 13
    _PLAN: Tuple[Tuple[int, int, int], ...] = (
        (1, 32, 3), (2, 64, 3), (3, 128, 3), (4, 64, 1), (5, 128, 3),
        (6, 256, 3), (7, 128, 1), (8, 256, 3), (9, 512, 3), (10, 256, 1),
        (11, 512, 3), (12, 256, 1), (13, 512, 3), (14, 1024, 3),
        (15, 512, 1), (16, 1024, 3), (17, 512, 1), (18, 1024, 3),
        (19, 1024, 3), (20, 1024, 3),
    )
    _POOL_AFTER = frozenset((1, 2, 5, 8, 13))

    def _block(self, x, idx: int, features: int, kernel: int,
               train: bool):
        features = max(features // self.width_div, 4)
        x = nn.Conv(features, (kernel, kernel), use_bias=False,
                    padding='SAME', dtype=self.dtype,
                    name=f'conv_{idx}')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         name=f'norm_{idx}')(x)
        return nn.leaky_relu(x, 0.1)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images (B, H, W, 3) normalized to [0, 1] →
        {'netout': (B, H/32, W/32, A, 5+C), 'conv_feat': (B, H/32, W/32, 1024)}
        """
        x = images.astype(self.dtype)
        skip = None
        for idx, features, kernel in self._PLAN:
            x = self._block(x, idx, features, kernel, train)
            if idx == 13:
                skip = x  # 512-ch tap (KerasYOLO.py:347)
            if idx in self._POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # Skip path: 1x1 conv_21 then space-to-depth (KerasYOLO.py:386-389)
        skip = self._block(skip, 21, 64, 1, train)
        skip = space_to_depth_2x(skip)
        x = jnp.concatenate([skip, x], axis=-1)

        x = self._block(x, 22, 1024, 3, train)
        conv_feat = x  # 'conv_feat' tap (KerasYOLO.py:396)

        head = nn.Conv(self.num_anchors * (5 + self.num_classes), (1, 1),
                       padding='SAME', dtype=self.dtype,
                       kernel_init=nn.initializers.lecun_normal(),
                       name='conv_23')(conv_feat)
        b, gh, gw, _ = head.shape
        netout = head.reshape(
            b, gh, gw, self.num_anchors, 5 + self.num_classes)
        return {'netout': netout.astype(jnp.float32),
                'conv_feat': conv_feat.astype(jnp.float32)}
