"""Pipeline parallelism: homogeneous stage stacks sharded over a mesh axis.

The reference's only multi-device capability is a static two-process split
(detector on one GPU, tracker on another, selected by env var —
/root/reference/models_tracking/BaseTracker.py:40-48). This framework's
default answer is better — one fused pjit program, so detection features
never leave the device — but deep *homogeneous* stacks (stacked ConvLSTM
tracking heads, repeated residual blocks) admit true pipeline parallelism,
the missing member of the DP/TP/SP/PP set:

- the S stages' parameters are sharded over a mesh axis: each device holds
  ONLY its stage's weights (real per-device memory scaling, unlike
  replication);
- microbatches (or timesteps) stream through the stages in a wavefront
  schedule: at tick t, stage s processes item t-s, so after the (S-1)-tick
  fill bubble every device computes every tick;
- stage outputs hop to the next device with `jax.lax.ppermute` over ICI —
  a point-to-point neighbour transfer, the cheapest collective there is.

For recurrent stages (stacked ConvLSTM), each device also carries its own
recurrent state across ticks — the classic stacked-RNN wavefront: stage s
is at timestep t-s while stage s+1 is at t-s-1, which is *exactly* the
sequential semantics, reordered.

Exactness is tested against the sequential composition in
tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_scan(stage_fn: Callable[[Any, Any, jnp.ndarray],
                                     tuple],
                  stacked_params: Any,
                  xs: jnp.ndarray,
                  mesh: Mesh,
                  axis_name: str = 'model',
                  carry_init: Optional[Any] = None):
    """Run S homogeneous stages over T items in a wavefront pipeline.

    Args:
      stage_fn: (params_s, carry_s, x) -> (carry_s, y) with y.shape ==
        x.shape (homogeneous stages). For stateless stages use `gpipe`.
      stacked_params: pytree whose leaves have leading axis S == size of
        `axis_name`; sharded so each device holds one stage's slice.
      xs: (T, ...) items — microbatches for GPipe use, timesteps for
        stacked-recurrence use.
      mesh: the framework mesh.
      axis_name: mesh axis to pipeline over.
      carry_init: per-stage recurrent state, stacked on a leading S axis;
        None for stateless stage_fns that ignore the carry.

    Returns:
      ys (T, ...): the last stage's output for every item, replicated.
    """
    s = mesh.shape[axis_name]
    t = xs.shape[0]
    lead = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if lead != s:
        raise ValueError(
            f'stacked_params leading axis {lead} != {axis_name} axis '
            f'size {s}')
    if carry_init is None:
        carry_init = jnp.zeros((s,), jnp.float32)  # dummy, unused

    # Shape check: a stage must map x -> same-shaped y, or the ring
    # handoff (and the output buffer) would be ill-typed.
    p0 = jax.tree_util.tree_map(lambda l: l[0], stacked_params)
    c0 = jax.tree_util.tree_map(lambda l: l[0], carry_init)
    _, y_shape = jax.eval_shape(stage_fn, p0, c0, xs[0])
    if (y_shape.shape, y_shape.dtype) != (xs.shape[1:], xs.dtype):
        raise ValueError(
            f'stage output {y_shape.shape}/{y_shape.dtype} must match '
            f'stage input {xs.shape[1:]}/{xs.dtype}')

    def local(params, carry, xs_rep):
        params = jax.tree_util.tree_map(lambda l: l[0], params)
        carry = jax.tree_util.tree_map(lambda l: l[0], carry)
        idx = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % s) for i in range(s)]

        # The replicated input stream becomes device-varying loop state
        # (carry arrives via P(axis_name, ...) and is already varying).
        xs_rep = jax.lax.pcast(xs_rep, (axis_name,), to='varying')
        recv = jnp.zeros_like(xs_rep[0])
        ys = jnp.zeros_like(xs_rep)

        def tick(k, state):
            recv, carry, ys = state
            x0 = jax.lax.dynamic_index_in_dim(
                xs_rep, jnp.minimum(k, t - 1), 0, keepdims=False)
            inp = jnp.where(idx == 0, x0, recv)
            new_carry, out = stage_fn(params, carry, inp)
            # Stage s is live for ticks [s, s+T): freeze its recurrent
            # state outside that window so bubble garbage can't leak in.
            live = jnp.logical_and(k >= idx, k < idx + t)
            carry = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old),
                new_carry, carry)
            # The last stage emits item k-(S-1).
            oi = k - (s - 1)
            safe = jnp.maximum(oi, 0)
            cur = jax.lax.dynamic_index_in_dim(ys, safe, 0,
                                               keepdims=False)
            val = jnp.where(jnp.logical_and(oi >= 0, idx == s - 1), out,
                            cur)
            ys = jax.lax.dynamic_update_index_in_dim(ys, val, safe, 0)
            recv = jax.lax.ppermute(out, axis_name, perm)
            return recv, carry, ys

        _, _, ys = jax.lax.fori_loop(0, t + s - 1, tick,
                                     (recv, carry, ys))
        # Only the last stage holds real outputs; share them.
        ys = jnp.where(idx == s - 1, ys, jnp.zeros_like(ys))
        return jax.lax.psum(ys, axis_name)

    p_spec = jax.tree_util.tree_map(
        lambda l: P(axis_name, *([None] * (l.ndim - 1))), stacked_params)
    c_spec = jax.tree_util.tree_map(
        lambda l: P(axis_name, *([None] * (l.ndim - 1))), carry_init)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(p_spec, c_spec, P()),
        out_specs=P())
    return fn(stacked_params, carry_init, xs)


def gpipe(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
          stacked_params: Any,
          xs: jnp.ndarray,
          mesh: Mesh,
          axis_name: str = 'model'):
    """GPipe-style microbatch pipeline for stateless homogeneous stages.

    stage_fn: (params_s, x) -> y with y.shape == x.shape. `xs` is the
    (M, ...) microbatch axis. Composition order: stage 0 first.
    """
    def wrapped(params, carry, x):
        return carry, stage_fn(params, x)

    return pipeline_scan(wrapped, stacked_params, xs, mesh, axis_name)
