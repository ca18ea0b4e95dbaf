"""Context-parallel recurrence: scan a cell over a time axis that is
sharded across the mesh.

The reference carries its temporal axis (SEQUENCE_LENGTH=4) densely through
Keras TimeDistributed + ConvLSTM2D on one GPU
(/root/reference/models_tracking/MultiObjDetTracker.py:170-183). The
TPU-native long-clip equivalent (SURVEY.md §5 'long-context') is:

- locally, `jax.lax.scan` over the time chunk (O(1) activation memory in T);
- across the mesh, shard T over an axis and pass the carried recurrent
  state shard-to-shard with `jax.lax.ppermute` over ICI — the moral
  equivalent of ring attention for a recurrent tracker.

A recurrence is inherently sequential, so an *exact* distributed scan runs
`num_shards` rounds, each round activating one shard (ring-rotating the
carry between rounds). Compute is replicated across rounds; **memory** —
the reason a clip wouldn't fit on one chip — is divided by `num_shards`,
and each device only materializes its T/num_shards slice of inputs and
outputs. An optional `halo` mode trades exactness for a single round by
warming each shard's state on the last `halo` frames of its neighbour
(state passed via the same ppermute), which is how streaming trackers are
deployed in practice.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def context_parallel_scan(cell_fn: Callable[..., tuple],
                          carry_init: Any,
                          xs: Any,
                          mesh: Mesh,
                          axis_name: str = 'data',
                          halo: int = 0,
                          consts: Any = None):
    """Scan `cell_fn` over the leading (time) axis of `xs`, sharded on
    `axis_name`.

    Args:
      cell_fn: (carry, x_t) -> (carry, y_t), a plain lax.scan step —
        or (consts, carry, x_t) -> (carry, y_t) when `consts` is given.
      carry_init: initial recurrent state (replicated pytree).
      xs: pytree with leading time axis T, divisible by the mesh axis size.
      mesh: the framework mesh.
      axis_name: mesh axis to shard time over.
      halo: 0 → exact multi-round ring scan; k>0 → one-round approximate
        scan, each shard warm-started on its own first k frames after
        receiving the neighbour's carry is skipped (local burn-in).
      consts: pytree of arrays the cell reads every step (e.g. recurrent
        weights), passed through shard_map as explicit replicated inputs.
        Cell weights MUST come in this way rather than by closure: a
        closed-over param that later acquires a committed NamedSharding
        (any jitted train step's donated state does after its first
        call) leaks an Auto-mesh sharding into the Manual shard_map
        body, and the scan's backward transpose then fails to
        materialize its zero cotangents (observed on step 2 of real
        sp training; the 2-step dryrun check exists to catch this).

    Returns:
      ys pytree with leading axis T, sharded on `axis_name`.
    """
    if consts is None:
        consts = ()
        full_cell = lambda _k, c, x: cell_fn(c, x)   # noqa: E731
    else:
        full_cell = cell_fn

    n = mesh.shape[axis_name]
    t = jax.tree_util.tree_leaves(xs)[0].shape[0]
    if t % n:
        raise ValueError(f'time axis {t} not divisible by axis size {n}')

    x_spec = jax.tree_util.tree_map(
        lambda l: P(axis_name, *([None] * (l.ndim - 1))),
        xs)
    c_spec = jax.tree_util.tree_map(lambda l: P(), carry_init)
    k_spec = jax.tree_util.tree_map(lambda l: P(), consts)

    def local(consts, carry, xs_local):
        cell_fn = functools.partial(full_cell, consts)
        # The carry enters replicated (P()) but the scan over the varying
        # xs_local makes it device-varying; cast explicitly (shard_map vma).
        carry = jax.tree_util.tree_map(
            lambda l: jax.lax.pcast(l, (axis_name,), to='varying'), carry)
        if n == 1:
            _, ys = jax.lax.scan(cell_fn, carry, xs_local)
            return ys
        my = jax.lax.axis_index(axis_name)
        perm = _ring_perm(n)

        if halo > 0:
            # One round: each shard warm-starts from a state burned in on
            # its predecessor's LAST `halo` frames — the frames that
            # immediately precede the shard boundary, i.e. the standard
            # sliding-window warm-up of streaming trackers. (Burning on
            # the predecessor's FIRST frames — the pre-round-4 behavior —
            # warms on temporally distant context and converges much
            # slower in `halo`; tests/test_parallel.py pins the decay.)
            # Approximation error decays with the cell's mixing time:
            # see the accuracy-vs-halo table in benchmarks/RESULTS.md.
            burn = jax.tree_util.tree_map(lambda l: l[-halo:], xs_local)
            warm, _ = jax.lax.scan(cell_fn, carry, burn)
            warm = jax.lax.ppermute(warm, axis_name, perm)
            start = jax.tree_util.tree_map(
                lambda w, c: jnp.where(my == 0, c, w), warm, carry)
            _, ys = jax.lax.scan(cell_fn, start, xs_local)
            return ys

        _, ys0 = jax.lax.scan(cell_fn, carry, xs_local)
        ys0 = jax.tree_util.tree_map(jnp.zeros_like, ys0)

        def round_body(r, state):
            carry, ys = state
            new_carry, new_ys = jax.lax.scan(cell_fn, carry, xs_local)
            mine = r == my
            ys = jax.tree_util.tree_map(
                lambda a, b: jnp.where(mine, a, b), new_ys, ys)
            carry = jax.tree_util.tree_map(
                lambda a, b: jnp.where(mine, a, b), new_carry, carry)
            return jax.lax.ppermute(carry, axis_name, perm), ys

        _, ys = jax.lax.fori_loop(0, n, round_body, (carry, ys0))
        return ys

    shard_fn = jax.shard_map(
        local, mesh=mesh, in_specs=(k_spec, c_spec, x_spec),
        out_specs=jax.tree_util.tree_map(
            lambda l: P(axis_name, *([None] * (l.ndim - 1))),
            jax.eval_shape(
                lambda k, c, x: jax.lax.scan(
                    functools.partial(full_cell, k), c, x)[1],
                consts, carry_init, xs)))
    return shard_fn(consts, carry_init, xs)
