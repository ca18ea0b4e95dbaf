"""FusedConvLSTM: shapes, state carry, recurrence correctness vs a
per-step reference computed with the same parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_tracking_tpu.models.convlstm import FusedConvLSTM


def _init(rng, b=2, t=3, h=4, w=4, c=5, f=6):
    model = FusedConvLSTM(features=f)
    x = jnp.asarray(rng.rand(b, t, h, w, c), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_output_shape_and_finite(rng):
    model, variables, x = _init(rng)
    y = model.apply(variables, x)
    assert y.shape == (2, 3, 4, 4, 6)
    assert np.isfinite(np.asarray(y)).all()


def test_forget_bias_init(rng):
    model, variables, _ = _init(rng, f=6)
    bias = np.asarray(variables['params']['input_proj']['bias'])
    np.testing.assert_array_equal(bias[6:12], 1.0)
    np.testing.assert_array_equal(bias[:6], 0.0)
    np.testing.assert_array_equal(bias[12:], 0.0)


def test_matches_per_step_reference(rng):
    """Replaying the scan by hand with the same params must agree."""
    model, variables, x = _init(rng, b=1, t=4, h=3, w=3, c=2, f=4)
    y = np.asarray(model.apply(variables, x))

    params = variables['params']
    wx = np.asarray(params['input_proj']['kernel'])
    bx = np.asarray(params['input_proj']['bias'])
    wh = np.asarray(params['recurrent_kernel'])

    def conv(inp, kern):
        return jax.lax.conv_general_dilated(
            jnp.asarray(inp), jnp.asarray(kern), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    f = 4
    c_st = np.zeros((1, 3, 3, f), np.float32)
    h_st = np.zeros((1, 3, 3, f), np.float32)
    for step in range(4):
        gates = np.asarray(conv(np.asarray(x[:, step]), wx)) + bx \
            + np.asarray(conv(h_st, wh))
        gi, gf, gg, go = np.split(gates, 4, axis=-1)
        sig = lambda v: 1 / (1 + np.exp(-v))
        c_st = sig(gf) * c_st + sig(gi) * np.tanh(gg)
        h_st = sig(go) * np.tanh(c_st)
        np.testing.assert_allclose(y[:, step], h_st, rtol=1e-4,
                                   atol=1e-5)


def test_state_carry_across_windows(rng):
    """Scanning 2T frames at once == two T-windows with carried state."""
    model, variables, x = _init(rng, b=1, t=6, h=3, w=3, c=2, f=4)
    full = np.asarray(model.apply(variables, x))

    y1, state = model.apply(variables, x[:, :3], return_state=True)
    y2 = model.apply(variables, x[:, 3:], initial_state=state)
    windowed = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    np.testing.assert_allclose(full, windowed, rtol=1e-5, atol=1e-6)


def test_gradients_flow(rng):
    model, variables, x = _init(rng)

    def loss(params):
        return jnp.mean(model.apply({'params': params}, x) ** 2)

    grads = jax.grad(loss)(variables['params'])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_convlstm_time_sharded_matches_dense():
    """Sequence parallelism exactness: FusedConvLSTM with time_shards=8
    over the 8-device CPU mesh reproduces the dense lax.scan bitwise-ish
    on the SAME params — the long-clip path of the flagship model."""
    from object_tracking_tpu.config import MeshConfig
    from object_tracking_tpu.models.convlstm import FusedConvLSTM
    from object_tracking_tpu.parallel import make_mesh

    mesh = make_mesh(MeshConfig())
    n = mesh.shape['data']
    b, t, h, w, c, f = 1, 2 * n, 4, 4, 6, 5
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, c))

    dense = FusedConvLSTM(f, (3, 3))
    variables = dense.init(jax.random.PRNGKey(1), x)
    sharded = FusedConvLSTM(f, (3, 3), time_shards=n, mesh=mesh)

    y_dense = dense.apply(variables, x)
    y_shard = sharded.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_shard), np.asarray(y_dense),
                               rtol=1e-5, atol=1e-5)


def test_joint_model_time_sharded_train_step():
    """The REAL MultiObjDetTracker trains with the ConvLSTM time-sharded:
    same params + same batch → same loss as the dense model, and one
    time-sharded train step executes on the 8-device mesh."""
    from object_tracking_tpu.config import (JointConfig, LossConfig,
                                            MeshConfig)
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.parallel import make_mesh, shard_batch
    from object_tracking_tpu.training import (TrainState,
                                              make_joint_train_step,
                                              make_optimizer)

    mesh = make_mesh(MeshConfig())
    n = mesh.shape['data']
    size, t, nc, na = 64, n, 2, 2
    gh = gw = size // 32
    anchors = [1.0, 1.0, 2.0, 2.0]

    dense = MultiObjDetTracker(num_classes=nc, num_anchors=na,
                               convlstm_features=8, width_div=8)
    sharded = MultiObjDetTracker(num_classes=nc, num_anchors=na,
                                 convlstm_features=8, width_div=8,
                                 time_shards=n, mesh=mesh)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, t, size, size, 3))
    variables = dense.init(jax.random.PRNGKey(1), x)

    out_d = dense.apply(variables, x)
    out_s = sharded.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_s['track']),
                               np.asarray(out_d['track']),
                               rtol=1e-4, atol=1e-4)

    batch = {
        'images': np.asarray(x),
        'y_true': np.zeros((1, t, gh, gw, na, 5 + nc), np.float32),
        'true_boxes': np.zeros((1, t, 1, 1, 1, 4, 4), np.float32),
    }
    state = TrainState.create(sharded.apply, variables,
                              make_optimizer(1e-3))
    step = make_joint_train_step(anchors, LossConfig(true_box_buffer=4),
                                 JointConfig())
    sharded_batch = shard_batch(mesh, batch, axis=1)
    new_state, metrics = step(state, sharded_batch)
    assert np.isfinite(float(metrics['loss']))


# ---------------------------------------------------------------------------
# StackedConvLSTM: deep tracking head, sequential vs pipeline-parallel
# ---------------------------------------------------------------------------
class TestStackedConvLSTM:

    def _make(self, pipeline=False, mesh=None, L=4, f=8):
        from object_tracking_tpu.models.convlstm import StackedConvLSTM
        return StackedConvLSTM(f, L, (3, 3), pipeline=pipeline,
                               mesh=mesh, axis_name='model')

    def test_pipeline_matches_sequential(self):
        """Same params: wavefront pipeline over the mesh 'model' axis ==
        plain layer-by-layer scan (exact, not approximate)."""
        import jax
        import jax.numpy as jnp

        from object_tracking_tpu.config import MeshConfig
        from object_tracking_tpu.parallel import make_mesh
        mesh = make_mesh(MeshConfig(model_parallel=4))
        b, t, h, w, f = 2, 6, 4, 4, 8
        x = jnp.asarray(np.random.RandomState(0).rand(
            b, t, h, w, f).astype(np.float32))
        seq = self._make(L=4, f=f)
        pipe = self._make(pipeline=True, mesh=mesh, L=4, f=f)
        variables = seq.init(jax.random.PRNGKey(0), x)
        y_seq = seq.apply(variables, x)
        y_pipe = pipe.apply(variables, x)        # identical param tree
        np.testing.assert_allclose(np.asarray(y_seq),
                                   np.asarray(y_pipe), atol=1e-5)

    def test_streaming_state_equivalence(self):
        """Full-clip scan == two half-windows with carried stacked state."""
        import jax
        import jax.numpy as jnp
        m = self._make(L=3, f=8)
        x = jnp.asarray(np.random.RandomState(1).rand(
            1, 8, 4, 4, 8).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        full = m.apply(variables, x)
        y1, st = m.apply(variables, x[:, :4], return_state=True)
        y2, _ = m.apply(variables, x[:, 4:], initial_state=st,
                        return_state=True)
        np.testing.assert_allclose(
            np.asarray(full), np.concatenate([y1, y2], axis=1),
            atol=1e-5)

    def test_wrong_width_rejected(self):
        import jax
        import jax.numpy as jnp
        m = self._make(L=2, f=8)
        with pytest.raises(ValueError):
            m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 4, 4, 5)))


def test_joint_model_deep_head_pipeline_matches_sequential():
    """MultiObjDetTracker convlstm_layers=5 (1 + 4 stacked): pp_layers
    over the 4-way model axis reproduces the sequential deep head, and
    streaming predict state round-trips."""
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.config import MeshConfig
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.parallel import make_mesh

    mesh = make_mesh(MeshConfig(model_parallel=4))
    kw = dict(num_classes=2, num_anchors=2, convlstm_features=8,
              width_div=8,
              convlstm_layers=5)
    seq = MultiObjDetTracker(**kw)
    pipe = MultiObjDetTracker(**kw, pp_layers=True, mesh=mesh)
    x = jnp.asarray(np.random.RandomState(0).rand(
        1, 4, 64, 64, 3).astype(np.float32))
    variables = seq.init(jax.random.PRNGKey(0), x)
    out_seq = seq.apply(variables, x)
    out_pipe = pipe.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_seq['track']),
                               np.asarray(out_pipe['track']), atol=1e-4)

    # streaming: zero_state + two windows == one window of the full clip
    st = seq.zero_state(1, 2, 2)
    out1 = seq.apply(variables, x[:, :2], initial_state=st,
                     return_state=True)
    out2 = seq.apply(variables, x[:, 2:],
                     initial_state=out1['state'], return_state=True)
    full = seq.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(full['track']),
        np.concatenate([out1['track'], out2['track']], axis=1),
        atol=1e-4)
