"""ConvLSTM recurrence, TPU-optimized.

The reference's tracking head is Keras `ConvLSTM2D(512, 3x3)` over T frames
(/root/reference/models_tracking/MultiObjDetTracker.py:176): each timestep
runs BOTH the input-to-gates conv and the recurrent conv inside the
sequential loop.

Here the two convs are split (the standard CuDNN-LSTM trick, applied to
the conv case):

- the input projection `W_x * x_t` for all four gates is computed for the
  WHOLE clip in one conv with time folded into the batch axis — a single
  large MXU-friendly batch (B·T) instead of T small sequential convs.
  With C_in ≈ 1024+A·(5+C) against 4·F output channels this is by far the
  FLOPs-heavier conv, and it leaves the sequential path entirely;
- `jax.lax.scan` then carries only the recurrent conv `W_h * h` (F → 4F)
  plus the fused gate elementwise (sigmoid/tanh/FMA — one VPU pass, fused
  by XLA), so the serial chain is as short as the recurrence allows.

Gate math matches Keras ConvLSTM2D (hard dependencies: i, f, g, o order is
irrelevant as params are learned; `unit_forget_bias=True` reproduced via
+1.0 on the forget-gate slice at init).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FusedConvLSTM(nn.Module):
    """ConvLSTM layer over (B, T, H, W, C) returning all hidden states.

    Attributes:
      features: hidden state channels F.
      kernel: conv kernel for both input and recurrent projections.
      dtype: compute dtype (params stay float32).
      time_shards: > 1 runs the sequential scan time-sharded over the
        mesh `data` axis via parallel.context.context_parallel_scan
        (sequence parallelism: each device materializes T/time_shards
        of the activations — the long-clip path). Requires `mesh`.
      mesh: the jax.sharding.Mesh to shard time over (static attribute;
        only consulted when time_shards > 1).
    """
    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32
    time_shards: int = 1
    mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 initial_state: Tuple[jnp.ndarray, jnp.ndarray] | None
                 = None,
                 return_state: bool = False):
        """x (B, T, H, W, C) → h (B, T, H, W, F) [, final (c, h) state]."""
        b, t, h, w, _ = x.shape
        f = self.features

        def forget_bias_init(key, shape, dtype=jnp.float32):
            bias = jnp.zeros(shape, dtype)
            return bias.at[f:2 * f].set(1.0)   # gate order: (i, f, g, o)

        # Input projection for every timestep at once: (B·T, H, W, C) →
        # (B·T, H, W, 4F). One big conv batch on the MXU.
        xp = nn.Conv(4 * f, self.kernel, padding='SAME', use_bias=True,
                     bias_init=forget_bias_init, dtype=self.dtype,
                     name='input_proj')(
            x.reshape((b * t,) + x.shape[2:]).astype(self.dtype))
        xp = xp.reshape(b, t, h, w, 4 * f)

        # Recurrent projection params (declared once, applied in the scan).
        wh = self.param(
            'recurrent_kernel', nn.initializers.orthogonal(),
            self.kernel + (f, 4 * f), jnp.float32)

        def rconv(hid):
            return jax.lax.conv_general_dilated(
                hid, wh.astype(self.dtype), (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=self.dtype)

        def step(carry, xt):
            c_prev, h_prev = carry
            gates = xt + rconv(h_prev)
            gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
            gi = jax.nn.sigmoid(gi)
            gf = jax.nn.sigmoid(gf)
            go = jax.nn.sigmoid(go)
            gg = jnp.tanh(gg)
            c_new = gf * c_prev + gi * gg
            h_new = go * jnp.tanh(c_new)
            return (c_new, h_new), h_new

        if initial_state is None:
            zeros = jnp.zeros((b, h, w, f), self.dtype)
            initial_state = (zeros, zeros)
        else:
            initial_state = jax.tree_util.tree_map(
                lambda a: a.astype(self.dtype), initial_state)

        # Scan over time: xs (T, B, H, W, 4F).
        xs = jnp.moveaxis(xp, 1, 0)
        if self.time_shards > 1:
            # Sequence parallelism: the input projection above is already
            # embarrassingly parallel over T (GSPMD shards it with the
            # input layout); only this sequential scan needs the explicit
            # ring treatment. The exact multi-round ring keeps per-device
            # activation memory at T/time_shards.
            if return_state:
                raise ValueError(
                    'time_shards > 1 does not return the final state '
                    '(streaming uses the dense scan); set '
                    'return_state=False')
            if self.mesh is None:
                raise ValueError('time_shards > 1 requires a mesh')
            from object_tracking_tpu.parallel.context import (
                context_parallel_scan)
            axis = self.mesh.axis_names[0]
            if self.mesh.shape[axis] != self.time_shards:
                raise ValueError(
                    f'time_shards={self.time_shards} must equal the mesh '
                    f'{axis!r} axis size {self.mesh.shape[axis]}')
            ys = context_parallel_scan(step, initial_state, xs,
                                       self.mesh, axis_name=axis)
            return jnp.moveaxis(ys, 0, 1)
        final, ys = jax.lax.scan(step, initial_state, xs)
        ys = jnp.moveaxis(ys, 0, 1)           # (B, T, H, W, F)
        if return_state:
            return ys, final
        return ys
