"""Halo-mode context-parallel scan: approximation error vs `halo`.

The exact sequence-parallel scan (parallel/context.py) runs num_shards
rounds; `halo > 0` trades exactness for ONE round by warm-starting each
shard on its predecessor's last `halo` frames — the deployment-streaming
mode. This harness quantifies what that trade costs on the REAL ConvLSTM
cell arithmetic (the FusedConvLSTM gate math of models/convlstm.py),
producing the accuracy-vs-halo table recorded in RESULTS.md; the decay
law it measures is pinned by tests/test_parallel.py.

Run on the virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/halo_accuracy.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def convlstm_cell():
    """The FusedConvLSTM scan step (models/convlstm.py step_with) as a
    standalone (w, carry, x_t) -> (carry, y_t) function."""
    import jax
    import jax.numpy as jnp

    def cell(w, carry, xt):
        c_prev, h_prev = carry
        gates = xt + jax.lax.conv_general_dilated(
            h_prev, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
        gi = jax.nn.sigmoid(gi)
        gf = jax.nn.sigmoid(gf + 1.0)   # unit forget bias, as in the layer
        go = jax.nn.sigmoid(go)
        gg = jnp.tanh(gg)
        c_new = gf * c_prev + gi * gg
        h_new = go * jnp.tanh(c_new)
        return (c_new, h_new), h_new

    return cell


def halo_error_table(num_shards: int = 4, t_local: int = 8,
                     features: int = 8, grid: int = 4, seed: int = 0):
    """[{halo, rel_l2, max_abs, boundary_rel}] for halo in 1..t_local
    (powers of two), errors vs the exact ring scan on the same mesh.

    rel_l2: ||approx - exact||2 / ||exact||2 over all outputs.
    boundary_rel: same, restricted to the first frame after each shard
      boundary (where the warm-start error is largest).
    """
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.config import MeshConfig
    from object_tracking_tpu.parallel import make_mesh
    from object_tracking_tpu.parallel.context import context_parallel_scan

    devices = jax.devices()
    assert len(devices) >= num_shards
    mesh = make_mesh(MeshConfig(data_parallel=num_shards),
                     devices[:num_shards])
    cell = convlstm_cell()
    rng = np.random.RandomState(seed)
    t = num_shards * t_local
    f = features
    w = jnp.asarray(rng.randn(3, 3, f, 4 * f) * 0.3, jnp.float32)
    xs = jnp.asarray(rng.randn(t, 1, grid, grid, 4 * f), jnp.float32)
    zeros = jnp.zeros((1, grid, grid, f), jnp.float32)
    carry0 = (zeros, zeros)

    exact = np.asarray(context_parallel_scan(
        cell, carry0, xs, mesh, 'data', consts=w))
    # Sanity: the exact ring matches a dense lax.scan.
    _, dense = jax.lax.scan(lambda c, x: cell(w, c, x), carry0, xs)
    np.testing.assert_allclose(exact, np.asarray(dense), rtol=1e-5,
                               atol=1e-5)

    norm = float(np.linalg.norm(exact))
    # First frame after each shard boundary (shard 0 is exact by
    # construction — it starts from the true initial carry).
    bidx = [s * t_local for s in range(1, num_shards)]
    bnorm = float(np.linalg.norm(exact[bidx]))

    rows = []
    halo = 1
    while halo <= t_local:
        approx = np.asarray(context_parallel_scan(
            cell, carry0, xs, mesh, 'data', halo=halo, consts=w))
        diff = approx - exact
        rows.append({
            'halo': halo,
            'rel_l2': float(np.linalg.norm(diff)) / norm,
            'max_abs': float(np.abs(diff).max()),
            'boundary_rel': float(np.linalg.norm(diff[bidx])) / bnorm,
        })
        halo *= 2
    return rows


def main():
    # sitecustomize pins the axon TPU plugin over the env var; honor a
    # JAX_PLATFORMS=cpu request (same dance as __graft_entry__).
    import jax
    if os.environ.get('JAX_PLATFORMS', '').strip().lower() == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    rows = halo_error_table()
    print('| halo (of T_local=8) | rel L2 error | max abs | '
          'boundary-frame rel |')
    print('|---|---|---|---|')
    for r in rows:
        print(f"| {r['halo']} | {r['rel_l2']:.2e} | {r['max_abs']:.2e} "
              f"| {r['boundary_rel']:.2e} |")


if __name__ == '__main__':
    main()
