"""Streaming state carry through MultiObjDetTracker and remat parity."""

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.models import MultiObjDetTracker


def _setup(rng, t=4, remat=False):
    model = MultiObjDetTracker(num_classes=3, num_anchors=2,
                               convlstm_features=8, remat=remat,
                               width_div=8)
    x = jnp.asarray(rng.rand(1, t, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_windowed_state_carry_matches_full_clip(rng):
    model, variables, x = _setup(rng, t=6)
    full = model.apply(variables, x, train=False)

    out1 = model.apply(variables, x[:, :3], train=False,
                       return_state=True)
    out2 = model.apply(variables, x[:, 3:], train=False,
                       initial_state=out1['state'])
    track = np.concatenate([np.asarray(out1['track']),
                            np.asarray(out2['track'])], axis=1)
    np.testing.assert_allclose(np.asarray(full['track']), track,
                               rtol=1e-4, atol=1e-5)


def test_no_carry_differs_from_carry(rng):
    """Restarting state every window (the reference's behavior) must NOT
    equal streaming — guards against silently dropping the carry."""
    model, variables, x = _setup(rng, t=6)
    full = model.apply(variables, x, train=False)
    cold = model.apply(variables, x[:, 3:], train=False)
    assert not np.allclose(np.asarray(full['track'][:, 3:]),
                           np.asarray(cold['track']), atol=1e-5)


def test_remat_forward_matches_no_remat(rng):
    model, variables, x = _setup(rng)
    model_r, _, _ = _setup(rng, remat=True)
    out = model.apply(variables, x, train=False)
    out_r = model_r.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out['track']),
                               np.asarray(out_r['track']),
                               rtol=1e-5, atol=1e-6)


def test_remat_gradients_match(rng):
    model, variables, x = _setup(rng, t=2)
    model_r = MultiObjDetTracker(num_classes=3, num_anchors=2,
                                 convlstm_features=8, remat=True,
                                 width_div=8)

    def loss(m, params):
        out, _ = m.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            x, train=True, mutable=['batch_stats'])
        return jnp.mean(out['track'] ** 2) + jnp.mean(out['detect'] ** 2)

    g = jax.grad(lambda p: loss(model, p))(variables['params'])
    g_r = jax.grad(lambda p: loss(model_r, p))(variables['params'])
    flat = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6), g, g_r)
    del flat


def test_joint_predictor_streams_state(rng):
    from object_tracking_tpu.config import YOLOV2_ANCHORS
    from object_tracking_tpu.inference import JointPredictor

    model, variables, x = _setup(rng, t=4)
    pred = JointPredictor(model, variables, YOLOV2_ANCHORS[:4],
                          labels=('a', 'b', 'c'), net_size=(64, 64),
                          obj_threshold=0.01)
    frames = np.asarray(rng.rand(8, 64, 64, 3), np.float32)
    results = pred.predict_video(list(frames), window=4)
    assert len(results) == 8
    assert pred._state is not None