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

from object_tracking_tpu.models.convlstm import FusedConvLSTM, StackedConvLSTM
from object_tracking_tpu.models.darknet19 import Darknet19


class MultiObjDetTracker(nn.Module):
    """Attributes beyond the reference's constants:
      remat: rematerialize the per-frame detector in the backward pass
        (jax.checkpoint) — trades FLOPs for HBM so clip length T can grow
        well past the reference's 4 without activation-memory blowup.
    """
    num_classes: int = 12     # MOT17 label set (MultiObjDetTracker.py:82)
    num_anchors: int = 5
    convlstm_features: int = 512
    dtype: Any = jnp.float32
    remat: bool = False
    # Backbone channel-width divisor (see Darknet19.width_div): fixture/
    # dry-run scale with full structural + sharding fidelity.
    width_div: int = 1
    # > 0 swaps the dense 1x1 output conv for a per-grid-cell
    # mixture-of-experts head (models/moe_head.py) whose expert-stacked
    # parameters shard over the mesh `model` axis — expert parallelism.
    moe_experts: int = 0
    moe_hidden: int = 256
    # > 1 time-shards the ConvLSTM scan over the mesh `data` axis
    # (sequence parallelism for long clips — each device holds
    # T/time_shards of the recurrent activations). Requires `mesh`;
    # see models/convlstm.py and parallel/context.py.
    time_shards: int = 1
    # Total ConvLSTM depth: layer 0 is the heterogeneous input-projection
    # FusedConvLSTM; layers 1..L-1 are a homogeneous StackedConvLSTM.
    # With pp_layers=True the stacked layers run PIPELINE-PARALLEL over
    # the mesh `model` axis (wavefront + ppermute, one layer's weights
    # per device — parallel/pipeline.py); the mesh model-axis size must
    # equal convlstm_layers - 1.
    convlstm_layers: int = 1
    pp_layers: bool = False
    mesh: Any = None

    def zero_state(self, batch: int, grid_h: int, grid_w: int):
        """Initial streaming state for `initial_state`: layer-0 (c, h)
        plus, for deep heads, the stacked layers' (c, h)."""
        z = jnp.zeros((batch, grid_h, grid_w, self.convlstm_features),
                      jnp.float32)
        if self.convlstm_layers > 1:
            zs = jnp.zeros((self.convlstm_layers - 1, batch, grid_h,
                            grid_w, self.convlstm_features), jnp.float32)
            return ((z, z), (zs, zs))
        return (z, z)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 initial_state=None, return_state: bool = False):
        """images (B, T, H, W, 3) in [0, 1] →
        {'detect': (B, T, GH, GW, A, 5+C), 'track': same
         [, 'state': final ConvLSTM (c, h) when return_state]}.

        `initial_state`/`return_state` carry the ConvLSTM state across
        clip windows — streaming inference over unbounded video, which
        the reference's restart-every-window predict cannot do
        (MultiObjDetTracker.py:295-315).
        """
        b, t, h, w, c = images.shape
        flat = images.reshape(b * t, h, w, c)

        # static_argnums=(2,): the `train` flag (0 = self, 1 = images).
        detector_cls = (nn.remat(Darknet19, static_argnums=(2,))
                        if self.remat else Darknet19)
        det = detector_cls(num_classes=self.num_classes,
                           num_anchors=self.num_anchors,
                           dtype=self.dtype, width_div=self.width_div,
                           name='detector')(flat, train)
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
        deep = self.convlstm_layers > 1
        state0 = initial_state[0] if (deep and initial_state is not None) \
            else (None if deep else initial_state)
        lstm = FusedConvLSTM(self.convlstm_features, (3, 3),
                             dtype=self.dtype,
                             time_shards=self.time_shards,
                             mesh=self.mesh, name='tconv_lstm')
        if return_state:
            z, state = lstm(z, initial_state=state0, return_state=True)
        else:
            z = lstm(z, initial_state=state0)

        if deep:
            stacked = StackedConvLSTM(
                self.convlstm_features, self.convlstm_layers - 1, (3, 3),
                dtype=self.dtype, pipeline=self.pp_layers,
                mesh=self.mesh, name='tconv_stack')
            stacked_state0 = (initial_state[1]
                              if initial_state is not None else None)
            if return_state:
                z, stacked_state = stacked(z, initial_state=stacked_state0,
                                           return_state=True)
                state = (state, stacked_state)
            else:
                z = stacked(z, initial_state=stacked_state0)

        if self.moe_experts:
            from object_tracking_tpu.models.moe_head import MoEGridHead
            z = MoEGridHead(num_experts=self.moe_experts,
                            hidden=self.moe_hidden,
                            out_features=out_ch, dtype=self.dtype,
                            name='tconv_moe')(z)
        else:
            z = nn.Conv(out_ch, (1, 1), padding='SAME', dtype=self.dtype,
                        kernel_init=nn.initializers.lecun_normal(),
                        name='tconv_2')(z)
        track = z.reshape(b, t, gh, gw, self.num_anchors,
                          5 + self.num_classes).astype(jnp.float32)
        out = {'track': track, 'detect': detect}
        if return_state:
            out['state'] = state
        return out
