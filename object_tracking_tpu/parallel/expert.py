"""Expert parallelism (EP): mixture-of-experts routing over the mesh.

The reference has no MoE and no expert parallelism (SURVEY.md §2's
parallelism inventory is empty), so this is a capability the TPU-native
framework adds to complete the DP/TP/PP/SP/EP set. It exists for the
optional MoE tracking head (`models/moe_head.py::MoEGridHead` — per
grid-cell top-1 routing to expert MLPs, replacing the dense 1x1 conv of
MultiObjDetTracker.py:182-183 when configured), whose expert-stacked
parameters are what EP shards.

Two equivalent execution paths, GShard/Switch-style semantics in both
(group-local top-1 routing with a fixed per-expert capacity — fixed
shapes, so XLA compiles one static program; overflow tokens are dropped,
i.e. contribute zero, the standard Switch behaviour):

- `moe_apply`: dense einsum formulation. One program, expert axis `E`
  carried as a tensor dimension — under pjit, GSPMD shards that axis over
  the mesh `model` axis (see `plan_tp_specs`' `_moe` rule), which IS
  expert parallelism the sharding-annotation way.
- `expert_parallel_moe`: explicit shard_map formulation — tokens sharded
  over the mesh axis, each device owns exactly one expert, dispatch and
  combine hop devices via `jax.lax.all_to_all` over ICI. Exactness
  against `moe_apply(num_groups=axis_size)` is tested in
  tests/test_expert.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def moe_capacity(tokens_per_group: int, num_experts: int,
                 capacity_factor: float) -> int:
    """Per-expert slot count per group (static)."""
    return max(1, math.ceil(
        tokens_per_group / num_experts * capacity_factor))


def init_moe_params(key: jax.Array, num_experts: int, d_in: int,
                    d_hidden: int, d_out: int,
                    dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Gate + expert-stacked 2-layer MLP parameters."""
    kg, k1, k2 = jax.random.split(key, 3)
    return {
        'gate': (jax.random.normal(kg, (d_in, num_experts)) /
                 math.sqrt(d_in)).astype(dtype),
        'w1': (jax.random.normal(k1, (num_experts, d_in, d_hidden)) /
               math.sqrt(d_in)).astype(dtype),
        'b1': jnp.zeros((num_experts, d_hidden), dtype),
        'w2': (jax.random.normal(k2, (num_experts, d_hidden, d_out)) /
               math.sqrt(d_hidden)).astype(dtype),
        'b2': jnp.zeros((num_experts, d_out), dtype),
    }


def _route(tokens: jnp.ndarray, gate_w: jnp.ndarray, num_experts: int,
           capacity: int):
    """Group-local top-1 routing.

    tokens (G, N, D) → dispatch (G, N, E, C) 0/1 slot assignment,
    combine = dispatch · gate-prob, aux = Switch load-balancing loss
    (mean over groups of E · Σ_e fraction_routed_e · mean_prob_e).
    """
    logits = jnp.einsum('gnd,de->gne', tokens, gate_w)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(logits, axis=-1)                      # (G, N)
    gate = jnp.take_along_axis(probs, expert[..., None],
                               axis=-1)[..., 0]
    onehot = jax.nn.one_hot(expert, num_experts,
                            dtype=jnp.float32)                # (G, N, E)
    # Slot index of each token within its expert's capacity buffer:
    # running count of same-expert tokens before (and including) it, -1.
    pos = jnp.cumsum(onehot, axis=1) - 1.0
    keep = jnp.where(pos < capacity, onehot, 0.0)
    slot = jax.nn.one_hot(
        jnp.clip(pos.astype(jnp.int32), 0, capacity - 1), capacity,
        dtype=jnp.float32)                                    # (G,N,E,C)
    dispatch = slot * keep[..., None]
    combine = dispatch * gate[..., None, None]
    aux = num_experts * jnp.mean(
        jnp.sum(jnp.mean(onehot, axis=1) * jnp.mean(probs, axis=1),
                axis=-1))
    return dispatch, combine, aux


def moe_apply(params: Dict[str, jnp.ndarray], tokens: jnp.ndarray,
              num_groups: int = 1, capacity_factor: float = 1.25,
              return_aux: bool = False):
    """Dense MoE forward. tokens (N, D) → (N, d_out).

    Tokens route top-1 within each of `num_groups` independent groups
    (group-local capacity, GShard semantics); overflow tokens contribute
    zero. The expert axis stays a tensor dimension, so GSPMD can shard
    it over the mesh — EP without code changes.
    """
    n, _ = tokens.shape
    g = num_groups
    if n % g:
        raise ValueError(f'{n} tokens not divisible by {g} groups')
    e = params['w1'].shape[0]
    cap = moe_capacity(n // g, e, capacity_factor)
    tok = tokens.reshape(g, n // g, -1)
    dispatch, combine, aux = _route(tok, params['gate'], e, cap)
    dispatch = dispatch.astype(tokens.dtype)
    combine = combine.astype(tokens.dtype)
    buf = jnp.einsum('gnec,gnd->gecd', dispatch, tok)
    h = jax.nn.relu(jnp.einsum('gecd,edh->gech', buf, params['w1'])
                    + params['b1'][:, None])
    y = jnp.einsum('gech,eho->geco', h, params['w2']) \
        + params['b2'][:, None]
    out = jnp.einsum('gnec,geco->gno', combine, y)
    out = out.reshape(n, -1)
    return (out, aux) if return_aux else out


def expert_parallel_moe(params: Dict[str, jnp.ndarray],
                        tokens: jnp.ndarray, mesh: Mesh,
                        axis_name: str = 'model',
                        capacity_factor: float = 1.25) -> jnp.ndarray:
    """Explicit-EP MoE forward: one expert per device, all_to_all hops.

    tokens (N, D) shard over `axis_name` (N % axis size == 0); each
    device routes its local tokens, ships each expert's capacity buffer
    to that expert's device with a tiled `all_to_all` (a single ICI
    shuffle), runs ITS expert's MLP on everything it received, and ships
    results back with the inverse all_to_all. Matches
    `moe_apply(..., num_groups=axis_size)` exactly: each device's local
    token shard is one routing group.
    """
    s = mesh.shape[axis_name]
    e = params['w1'].shape[0]
    if e != s:
        raise ValueError(
            f'{e} experts != {axis_name} axis size {s}; explicit EP '
            f'places one expert per device')
    n, _ = tokens.shape
    if n % s:
        raise ValueError(f'{n} tokens not divisible by axis size {s}')
    cap = moe_capacity(n // s, e, capacity_factor)

    def local(p, tok):
        # Expert-sharded leaves arrive with a leading axis of 1: this
        # device's expert. The gate is replicated.
        my = {k: p[k][0] for k in ('w1', 'b1', 'w2', 'b2')}
        dispatch, combine, _ = _route(tok[None], p['gate'], e, cap)
        dispatch = dispatch[0].astype(tok.dtype)
        combine = combine[0].astype(tok.dtype)
        buf = jnp.einsum('nec,nd->ecd', dispatch, tok)
        # Row j of `buf` is destined for expert/device j; after the
        # tiled all_to_all, row j of `recv` came from device j.
        recv = jax.lax.all_to_all(buf, axis_name, 0, 0, tiled=True)
        h = jax.nn.relu(jnp.einsum('scd,dh->sch', recv, my['w1'])
                        + my['b1'])
        y = jnp.einsum('sch,ho->sco', h, my['w2']) + my['b2']
        back = jax.lax.all_to_all(y, axis_name, 0, 0, tiled=True)
        return jnp.einsum('nec,eco->no', combine, back)

    p_specs = {
        'gate': P(),
        'w1': P(axis_name, None, None), 'b1': P(axis_name, None),
        'w2': P(axis_name, None, None), 'b2': P(axis_name, None),
    }
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(p_specs, P(axis_name)),
                       out_specs=P(axis_name))
    return fn(params, tokens)
