"""Mesh/sharding and context-parallel scan tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_tracking_tpu.config import MeshConfig
from object_tracking_tpu.parallel import (
    context_parallel_scan, data_sharding, local_batch_size, make_mesh,
    shard_batch)


def test_mesh_shape_default():
    mesh = make_mesh()
    assert mesh.shape['data'] == len(jax.devices())
    assert mesh.shape['model'] == 1


def test_mesh_model_parallel_split():
    mesh = make_mesh(MeshConfig(model_parallel=2))
    assert mesh.shape['data'] == len(jax.devices()) // 2
    assert mesh.shape['model'] == 2


def test_local_batch_size():
    mesh = make_mesh()
    dp = mesh.shape['data']
    assert local_batch_size(mesh, 4 * dp) == 4
    with pytest.raises(ValueError):
        local_batch_size(mesh, dp + 1)


def test_shard_batch_layout():
    mesh = make_mesh()
    dp = mesh.shape['data']
    batch = {'x': np.zeros((dp * 2, 3)), 'y': np.zeros((dp * 2,))}
    out = shard_batch(mesh, batch)
    assert out['x'].sharding.is_equivalent_to(
        data_sharding(mesh, 2), ndim=2)
    # Ragged leading dim falls back to replication, never errors.
    ragged = shard_batch(mesh, {'x': np.zeros((dp + 1, 3))})
    assert ragged['x'].shape == (dp + 1, 3)


def _cell(c, x):
    c = jnp.tanh(c * 0.9 + x)
    return c, 2.0 * c


def test_context_parallel_scan_exact_matches_lax_scan(rng):
    mesh = make_mesh()
    t = mesh.shape['data'] * 3
    xs = jnp.asarray(rng.randn(t, 4), jnp.float32)
    c0 = jnp.zeros((4,))
    ys = context_parallel_scan(_cell, c0, xs, mesh, 'data')
    _, ys_ref = jax.lax.scan(_cell, c0, xs)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)


def test_context_parallel_scan_pytree_carry(rng):
    mesh = make_mesh()
    t = mesh.shape['data'] * 2

    def cell(carry, x):
        h = jnp.tanh(carry['h'] + x)
        c = carry['c'] * 0.5 + h
        return {'h': h, 'c': c}, h + c

    xs = jnp.asarray(rng.randn(t, 2), jnp.float32)
    c0 = {'h': jnp.zeros((2,)), 'c': jnp.zeros((2,))}
    ys = context_parallel_scan(cell, c0, xs, mesh, 'data')
    _, ys_ref = jax.lax.scan(cell, c0, xs)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)


def test_context_parallel_scan_halo_shape(rng):
    mesh = make_mesh()
    t = mesh.shape['data'] * 4
    xs = jnp.asarray(rng.randn(t, 4), jnp.float32)
    ys = context_parallel_scan(_cell, jnp.zeros((4,)), xs, mesh, 'data',
                               halo=2)
    assert ys.shape == (t, 4)
    # First shard is exact regardless of halo.
    _, ys_ref = jax.lax.scan(_cell, jnp.zeros((4,)), xs)
    per = t // mesh.shape['data']
    np.testing.assert_allclose(np.asarray(ys[:per]),
                               np.asarray(ys_ref[:per]), rtol=1e-5,
                               atol=1e-5)
