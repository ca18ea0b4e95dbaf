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

        def rconv(w, hid):
            return jax.lax.conv_general_dilated(
                hid, w.astype(self.dtype), (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=self.dtype)

        # The recurrent kernel is threaded as an explicit argument (not a
        # closure) so the sp path can hand it to context_parallel_scan as
        # a shard_map input — see its `consts` docstring for why a
        # closed-over param breaks the second training step.
        def step_with(w, carry, xt):
            c_prev, h_prev = carry
            gates = xt + rconv(w, h_prev)
            gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
            gi = jax.nn.sigmoid(gi)
            gf = jax.nn.sigmoid(gf)
            go = jax.nn.sigmoid(go)
            gg = jnp.tanh(gg)
            c_new = gf * c_prev + gi * gg
            h_new = go * jnp.tanh(c_new)
            return (c_new, h_new), h_new

        def step(carry, xt):
            return step_with(wh, carry, xt)

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
            ys = context_parallel_scan(step_with, initial_state, xs,
                                       self.mesh, axis_name=axis,
                                       consts=wh)
            return jnp.moveaxis(ys, 0, 1)
        final, ys = jax.lax.scan(step, initial_state, xs)
        ys = jnp.moveaxis(ys, 0, 1)           # (B, T, H, W, F)
        if return_state:
            return ys, final
        return ys


class StackedConvLSTM(nn.Module):
    """L homogeneous F→F ConvLSTM layers — the deep tracking head.

    The reference's head is a single ConvLSTM2D (a commented-out Conv2D
    alternative at MultiObjDetTracker.py:178-180 is the only depth it
    ever considered). Stacking recurrent layers is the natural way to
    deepen it, and on a TPU mesh it admits TRUE pipeline parallelism:
    layer l processes timestep t while layer l+1 processes t-1 — the
    classic stacked-RNN wavefront, which is exactly sequential semantics
    reordered. With `pipeline=True` the stages run via
    parallel.pipeline.pipeline_scan: each device holds ONLY its layer's
    weights (real per-device parameter-memory scaling) and activations
    hop to the next stage with a `ppermute` neighbour transfer over ICI.

    Parameters are stacked on a leading L axis and are IDENTICAL between
    the sequential and pipelined paths, so checkpoints are
    interchangeable and exactness is testable (tests/test_convlstm.py).

    Sequential mode supports streaming (`initial_state`/`return_state`
    with (c, h) stacked on the layer axis); pipeline mode is a training
    configuration and rejects `return_state` like time-sharding does.
    """
    features: int
    num_layers: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32
    pipeline: bool = False
    mesh: Any = None
    axis_name: str = 'model'

    @nn.compact
    def __call__(self, x: jnp.ndarray, initial_state=None,
                 return_state: bool = False):
        """x (B, T, H, W, F) → (B, T, H, W, F) [, final (c, h) each
        (L, B, H, W, F) when return_state]."""
        b, t, h, w, f = x.shape
        if f != self.features:
            raise ValueError(
                f'StackedConvLSTM is homogeneous: input channels {f} '
                f'must equal features {self.features}')
        L = self.num_layers
        kh, kw = self.kernel

        def forget_bias_init(key, shape, dtype=jnp.float32):
            bias = jnp.zeros(shape, dtype)
            return bias.at[:, f:2 * f].set(1.0)    # (L, 4F), (i,f,g,o)

        def stacked_orthogonal(key, shape, dtype=jnp.float32):
            keys = jax.random.split(key, shape[0])
            init = nn.initializers.orthogonal()
            return jnp.stack([init(k, shape[1:], dtype) for k in keys])

        wx = self.param('input_kernel', stacked_orthogonal,
                        (L, kh, kw, f, 4 * f), jnp.float32)
        bx = self.param('input_bias', forget_bias_init, (L, 4 * f),
                        jnp.float32)
        wh = self.param('recurrent_kernel', stacked_orthogonal,
                        (L, kh, kw, f, 4 * f), jnp.float32)

        def conv(inp, kern):
            return jax.lax.conv_general_dilated(
                inp, kern.astype(self.dtype), (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=self.dtype)

        def cell(params, carry, xt):
            """One layer, one timestep: xt (B, H, W, F) → same shape."""
            lwx, lbx, lwh = params
            c_prev, h_prev = carry
            gates = (conv(xt.astype(self.dtype), lwx)
                     + lbx.astype(self.dtype)
                     + conv(h_prev, lwh))
            gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
            c_new = (jax.nn.sigmoid(gf) * c_prev
                     + jax.nn.sigmoid(gi) * jnp.tanh(gg))
            h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
            return (c_new, h_new), h_new.astype(self.dtype)

        if initial_state is None:
            zeros = jnp.zeros((L, b, h, w, f), self.dtype)
            initial_state = (zeros, zeros)
        else:
            initial_state = jax.tree_util.tree_map(
                lambda a: a.astype(self.dtype), initial_state)

        xs = jnp.moveaxis(x, 1, 0).astype(self.dtype)   # (T, B, H, W, F)

        if self.pipeline:
            if return_state:
                raise ValueError(
                    'pipeline=True does not return the final state '
                    '(streaming uses the sequential path)')
            if self.mesh is None:
                raise ValueError('pipeline=True requires a mesh')
            if self.mesh.shape[self.axis_name] != L:
                raise ValueError(
                    f'num_layers={L} must equal the mesh '
                    f'{self.axis_name!r} axis size '
                    f'{self.mesh.shape[self.axis_name]}')
            from object_tracking_tpu.parallel.pipeline import pipeline_scan
            ys = pipeline_scan(cell, (wx, bx, wh), xs, self.mesh,
                               axis_name=self.axis_name,
                               carry_init=initial_state)
            return jnp.moveaxis(ys, 0, 1)

        # Sequential composition (same params): layer by layer.
        finals_c, finals_h = [], []
        for layer in range(L):
            params_l = (wx[layer], bx[layer], wh[layer])
            carry0 = jax.tree_util.tree_map(lambda a: a[layer],
                                            initial_state)
            carry, ys = jax.lax.scan(
                lambda cr, xt: cell(params_l, cr, xt), carry0, xs)
            xs = ys
            finals_c.append(carry[0])
            finals_h.append(carry[1])
        out = jnp.moveaxis(xs, 0, 1)
        if return_state:
            return out, (jnp.stack(finals_c), jnp.stack(finals_h))
        return out
