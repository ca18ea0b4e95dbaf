"""Model shape/jit/weight-ingestion tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_tracking_tpu.config import DetectorConfig
from object_tracking_tpu.models import (
    Darknet19, MultiObjDetTracker, TinyTracker,
)
from object_tracking_tpu.models.darknet19 import space_to_depth_2x
from object_tracking_tpu.models.yolov2 import YOLOv2Detector, rerandomize_head
from object_tracking_tpu.ops.weights import (
    DARKNET19_CONV_PLAN, DARKNET19_IN_CHANNELS, load_yolov2_weights,
)


def test_space_to_depth_matches_tf_order():
    x = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(jnp.float32)
    y = space_to_depth_2x(x)
    assert y.shape == (2, 2, 2, 12)
    # tf.space_to_depth: out[b, i, j] = [in[b,2i,2j], in[b,2i,2j+1],
    #                                    in[b,2i+1,2j], in[b,2i+1,2j+1]]
    np.testing.assert_allclose(
        np.asarray(y[0, 0, 0]),
        np.concatenate([np.asarray(x[0, 0, 0]), np.asarray(x[0, 0, 1]),
                        np.asarray(x[0, 1, 0]), np.asarray(x[0, 1, 1])]))


@pytest.fixture(scope='module')
def small_darknet():
    # width-divided: mechanism fixture (full-width channel layout is
    # pinned by the weight-loader shape tests and the slow-tier
    # stock-scale rehearsal)
    m = Darknet19(num_classes=3, width_div=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return m, v


def test_darknet_shapes(small_darknet):
    m, v = small_darknet
    out = m.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out['netout'].shape == (2, 2, 2, 5, 8)
    assert out['conv_feat'].shape == (2, 2, 2, 128)   # 1024 // 8


def test_darknet_train_mode_mutates_batch_stats(small_darknet):
    m, v = small_darknet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out, updates = m.apply(v, x, train=True, mutable=['batch_stats'])
    before = v['batch_stats']['norm_1']['mean']
    after = updates['batch_stats']['norm_1']['mean']
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_darknet_jit_deterministic(small_darknet):
    m, v = small_darknet
    f = jax.jit(lambda x: m.apply(v, x, train=False)['netout'])
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(f(x)))


def make_fake_weights_file(num_classes=3, num_anchors=5, with_head=True,
                           version=(0, 0, 0)):
    """Synthesize a darknet-format .weights stream with deterministic
    values so ingestion order can be asserted. `version` controls the
    header layout: major*10+minor >= 2 writes `seen` as uint64 (5-slot
    header, like stock yolov2.weights), else int32 (4-slot)."""
    major, minor, revision = version
    seen_slots = 2 if major * 10 + minor >= 2 else 1
    header = np.zeros(3 + seen_slots, np.float32)
    header[:3] = np.array(version, np.int32).view(np.float32)
    chunks = [header]
    rng = np.random.RandomState(7)
    for (name, cout, k), cin in zip(DARKNET19_CONV_PLAN,
                                    DARKNET19_IN_CHANNELS):
        for stat in range(4):  # beta, gamma, mean, var
            vals = rng.randn(cout).astype(np.float32)
            if stat == 3:
                # var must be positive or the BN sqrt NaNs the forward
                vals = np.abs(vals) + 0.5
            chunks.append(vals)
        chunks.append(rng.randn(cout * cin * k * k).astype(np.float32))
    if with_head:
        head = num_anchors * (5 + num_classes)
        chunks.append(rng.randn(head).astype(np.float32))
        chunks.append(rng.randn(head * 1024).astype(np.float32))
    fd, path = tempfile.mkstemp(suffix='.weights')
    with os.fdopen(fd, 'wb') as f:
        np.concatenate(chunks).tofile(f)
    return path


def test_weight_loader_roundtrip():
    path = make_fake_weights_file()
    try:
        loaded = load_yolov2_weights(path, num_classes=3)
        assert loaded['params']['conv_1']['kernel'].shape == (3, 3, 3, 32)
        assert loaded['params']['conv_22']['kernel'].shape == (3, 3, 1280,
                                                               1024)
        assert loaded['params']['conv_23']['kernel'].shape == (1, 1, 1024,
                                                               40)
        assert loaded['params']['conv_23']['bias'].shape == (40,)
        assert loaded['batch_stats']['norm_1']['mean'].shape == (32,)
        # file order per conv is beta, gamma, mean, var
        raw = np.fromfile(path, np.float32)
        np.testing.assert_allclose(loaded['params']['norm_1']['bias'],
                                   raw[4:36])       # beta
        np.testing.assert_allclose(loaded['params']['norm_1']['scale'],
                                   raw[36:68])      # gamma
    finally:
        os.unlink(path)


def test_weight_loader_v2_header():
    """darknet >= 0.2 writes a 5-slot header (uint64 `seen`) — e.g. stock
    pjreddie yolov2.weights; the reader must size the skip from the
    version ints, or every parameter shifts by one float."""
    p4 = make_fake_weights_file(version=(0, 0, 0))
    p5 = make_fake_weights_file(version=(0, 2, 0))
    try:
        a = load_yolov2_weights(p4, num_classes=3)
        b = load_yolov2_weights(p5, num_classes=3)
        np.testing.assert_array_equal(a['params']['conv_1']['kernel'],
                                      b['params']['conv_1']['kernel'])
        np.testing.assert_array_equal(a['params']['conv_23']['bias'],
                                      b['params']['conv_23']['bias'])
    finally:
        os.unlink(p4)
        os.unlink(p5)


def test_detector_ingests_fake_weights():
    path = make_fake_weights_file()
    try:
        cfg = DetectorConfig(labels=('a', 'b', 'c'), image_h=64,
                             image_w=64, weights_path=path)
        det = YOLOv2Detector(cfg)
        loaded = load_yolov2_weights(path, 3)
        np.testing.assert_allclose(
            np.asarray(det.variables['params']['conv_1']['kernel']),
            loaded['params']['conv_1']['kernel'])
        out = det.forward(jnp.zeros((1, 64, 64, 3)))
        assert out['netout'].shape == (1, 2, 2, 5, 8)
        assert det.get_layer_dims('conv_feat') == (2, 2, 1024)
    finally:
        os.unlink(path)


def test_rerandomize_head(small_darknet):
    m, v = small_darknet
    v2 = rerandomize_head(v, jax.random.PRNGKey(0), 13, 13)
    old = np.asarray(v['params']['conv_23']['kernel'])
    new = np.asarray(v2['params']['conv_23']['kernel'])
    assert not np.allclose(old, new)
    assert np.abs(new).std() < np.abs(old).std() * 10
    # everything else untouched
    np.testing.assert_allclose(
        np.asarray(v2['params']['conv_1']['kernel']),
        np.asarray(v['params']['conv_1']['kernel']))


def test_tiny_tracker_shapes_and_pools():
    for pool, feat_hw in [('Global', (13, 13)), ('Max', (8, 8))]:
        m = TinyTracker(lstm_units=32, out_dim=4, pool=pool)
        feats = jnp.zeros((2, 4) + feat_hw + (16,))
        det = jnp.zeros((2, 4, 4))
        v = m.init(jax.random.PRNGKey(0), feats, det)
        y = m.apply(v, feats, det)
        assert y.shape == (2, 4, 4)
        assert ((np.asarray(y) >= 0) & (np.asarray(y) <= 1)).all()


def test_tiny_tracker_heatmap_head():
    m = TinyTracker(lstm_units=32, out_dim=32 * 32)
    feats = jnp.zeros((1, 4, 13, 13, 16))
    det = jnp.zeros((1, 4, 32 * 32))
    v = m.init(jax.random.PRNGKey(0), feats, det)
    assert m.apply(v, feats, det).shape == (1, 4, 32 * 32)


def test_joint_model_shapes_and_grad():
    m = MultiObjDetTracker(num_classes=3, convlstm_features=8,
                           width_div=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 64, 3)) * 0.1
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, train=False)
    assert out['track'].shape == (1, 2, 2, 2, 5, 8)
    assert out['detect'].shape == (1, 2, 2, 2, 5, 8)

    def loss_fn(params):
        o = m.apply({'params': params,
                     'batch_stats': v['batch_stats']}, x, train=False)
        return jnp.sum(o['track'] ** 2) + jnp.sum(o['detect'] ** 2)

    g = jax.grad(loss_fn)(v['params'])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


@pytest.mark.slow   # full 23-block stock-size stream (~200 MB); the
#                       stock-scale rehearsal (test_weights_fullsize,
#                       slow tier) covers the byte-exact round-trip too
def test_weight_exporter_inverse_of_loader():
    """export_yolov2_weights ∘ load_yolov2_weights reproduces the file
    byte-for-byte (modern 5-slot header) — the darknet binary is a
    two-way interchange format here, unlike the reference's read-only
    WeightReader (utility/utils.py:138-148)."""
    from object_tracking_tpu.ops.weights import export_yolov2_weights
    src = make_fake_weights_file(version=(0, 2, 0))
    out = src + '.rt'
    try:
        loaded = load_yolov2_weights(src, num_classes=3)
        seen = int(np.fromfile(src, dtype=np.uint64, count=1, offset=12)[0])
        export_yolov2_weights(loaded, out, seen=seen)
        np.testing.assert_array_equal(np.fromfile(src, np.uint8),
                                      np.fromfile(out, np.uint8))
    finally:
        os.unlink(src)
        if os.path.exists(out):
            os.unlink(out)


def test_tiny_tracker_residual_head_is_echo_at_init(rng):
    """residual_det=True: zero-initialized correction head → the model
    reproduces its detection input exactly at init (the production bbox
    head's whole point: generalization starts from the detector echo,
    training only learns temporal smoothing on top)."""
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.models import TinyTracker

    tt = TinyTracker(lstm_units=8, out_dim=4, residual_det=True)
    feats = jnp.asarray(rng.rand(2, 3, 4, 4, 8), jnp.float32)
    det = jnp.asarray(rng.rand(2, 3, 4), jnp.float32)
    v = tt.init(jax.random.PRNGKey(0), feats, det)
    out = tt.apply(v, feats, det)
    np.testing.assert_allclose(np.asarray(out), np.asarray(det),
                               rtol=0, atol=1e-6)


def test_tiny_tracker_residual_head_gates_on_detection_presence(rng):
    """Frames whose detection input is all-zero (detector miss / dropped
    frame) route to the from-scratch fill-in head instead of echoing the
    zeros: the output there is a valid sigmoid box, not the zero vector,
    while present frames keep the exact echo at init."""
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.models import TinyTracker

    tt = TinyTracker(lstm_units=8, out_dim=4, residual_det=True)
    feats = jnp.asarray(rng.rand(1, 4, 4, 4, 8), jnp.float32)
    det = np.asarray(rng.rand(1, 4, 4), np.float32)
    det[0, 2] = 0.0                       # frame 2: detector miss
    det = jnp.asarray(det)
    v = tt.init(jax.random.PRNGKey(0), feats, det)
    out = np.asarray(tt.apply(v, feats, det))
    # present frames: exact echo (zero-init correction)
    for t in (0, 1, 3):
        np.testing.assert_allclose(out[0, t], np.asarray(det)[0, t],
                                   rtol=0, atol=1e-6)
    # missed frame: fill-in head output, strictly inside (0, 1) — NOT
    # the zero echo
    assert np.all(out[0, 2] > 0.0) and np.all(out[0, 2] < 1.0)
    assert np.abs(out[0, 2]).sum() > 0.1
