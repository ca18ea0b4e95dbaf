"""Darknet cfg→JAX compiler: parsing, shapes, weight ingestion, and
bit-exact equivalence of the compiled-yolov2-cfg model vs the hand-built
Darknet19 module on the same .weights stream."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_tracking_tpu.models.darknet_cfg import (
    DarknetCfgNet, build_from_cfg, compile_cfg, decode_cfg_outputs,
    decode_yolo3_netout, head_specs, load_weights_for_cfg,
    parse_darknet_cfg)

# The standard YOLOv2 graph as a darknet cfg (classes=3, matching the
# synthetic weights fixture in test_models.py).
YOLOV2_CFG = """
[net]
height=64
width=64
channels=3

[convolutional]
batch_normalize=1
filters=32
size=3
activation=leaky
[maxpool]
size=2
stride=2
[convolutional]
batch_normalize=1
filters=64
size=3
activation=leaky
[maxpool]
size=2
stride=2
[convolutional]
batch_normalize=1
filters=128
size=3
activation=leaky
[convolutional]
batch_normalize=1
filters=64
size=1
activation=leaky
[convolutional]
batch_normalize=1
filters=128
size=3
activation=leaky
[maxpool]
size=2
stride=2
[convolutional]
batch_normalize=1
filters=256
size=3
activation=leaky
[convolutional]
batch_normalize=1
filters=128
size=1
activation=leaky
[convolutional]
batch_normalize=1
filters=256
size=3
activation=leaky
[maxpool]
size=2
stride=2
[convolutional]
batch_normalize=1
filters=512
size=3
activation=leaky
[convolutional]
batch_normalize=1
filters=256
size=1
activation=leaky
[convolutional]
batch_normalize=1
filters=512
size=3
activation=leaky
[convolutional]
batch_normalize=1
filters=256
size=1
activation=leaky
[convolutional]
batch_normalize=1
filters=512
size=3
activation=leaky
[maxpool]
size=2
stride=2
[convolutional]
batch_normalize=1
filters=1024
size=3
activation=leaky
[convolutional]
batch_normalize=1
filters=512
size=1
activation=leaky
[convolutional]
batch_normalize=1
filters=1024
size=3
activation=leaky
[convolutional]
batch_normalize=1
filters=512
size=1
activation=leaky
[convolutional]
batch_normalize=1
filters=1024
size=3
activation=leaky
[convolutional]
batch_normalize=1
filters=1024
size=3
activation=leaky
[convolutional]
batch_normalize=1
filters=1024
size=3
activation=leaky

[route]
layers=-9

[convolutional]
batch_normalize=1
filters=64
size=1
activation=leaky

[reorg]
stride=2

[route]
layers=-1,-4

[convolutional]
batch_normalize=1
filters=1024
size=3
activation=leaky

[convolutional]
filters=40
size=1
activation=linear

[region]
anchors=0.57,0.67, 1.87,2.06, 3.33,5.47, 7.88,3.53, 9.77,9.17
num=5
classes=3
"""

TINY_CFG = """
[net]
height=32
width=32
channels=3
[convolutional]
batch_normalize=1
filters=8
size=3
activation=leaky
[maxpool]
size=2
stride=2
[convolutional]
batch_normalize=1
filters=16
size=3
activation=leaky
# tiny-yolo edge case: stride-1 pool keeps spatial dims
[maxpool]
size=2
stride=1
[convolutional]
filters=21
size=1
activation=linear
[region]
anchors=1.0,1.0, 2.0,2.0, 3.0,3.0
num=3
classes=2
"""

V3_CFG = """
[net]
height=32
width=32
channels=3
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
activation=leaky
[convolutional]
batch_normalize=1
filters=8
size=3
activation=leaky
[shortcut]
from=-2
activation=linear
[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
activation=leaky
[convolutional]
filters=21
size=1
activation=linear
[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=2
[route]
layers=-3
[upsample]
stride=2
[convolutional]
filters=21
size=1
activation=linear
[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=2
"""


def test_parse_sections():
    secs = parse_darknet_cfg(TINY_CFG)
    assert secs[0]['type'] == 'net'
    assert [s['type'] for s in secs[1:]] == [
        'convolutional', 'maxpool', 'convolutional', 'maxpool',
        'convolutional', 'region']


def test_compile_resolves_negative_routes():
    _, plan = compile_cfg(parse_darknet_cfg(YOLOV2_CFG))
    routes = [l for l in plan if l[0] == 'route']
    assert routes[0] == ('route', (16,))          # -9 from index 25
    assert routes[1] == ('route', (27, 24))       # -1, -4 from index 28


def test_tiny_cfg_shapes():
    model, (h, w, c) = build_from_cfg(TINY_CFG)
    x = jnp.zeros((1, h, w, c))
    variables = model.init(jax.random.PRNGKey(0), x)
    # arrays-only output: the full apply must survive jit
    out = jax.jit(model.apply)(variables, x)
    # stride-1 pool keeps 16x16
    assert out['heads'][0].shape == (1, 16, 16, 3, 7)
    assert head_specs(model.plan)[0]['kind'] == 'region'


def test_v3_cfg_two_heads_and_decode():
    model, (h, w, c) = build_from_cfg(V3_CFG)
    x = jnp.zeros((1, h, w, c))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert len(out['heads']) == 2
    assert out['heads'][0].shape == (1, 8, 8, 3, 7)
    assert out['heads'][1].shape == (1, 16, 16, 3, 7)
    boxes, labels, scores, valid = decode_cfg_outputs(
        out['heads'], net_size=(h, w), obj_threshold=0.0, top_k=16,
        specs=head_specs(model.plan))
    assert boxes.shape == (16, 4) and valid.dtype == bool


def test_yolo3_decode_matches_hand_computed():
    netout = np.zeros((1, 1, 1, 5 + 2), np.float32)
    netout[0, 0, 0, :4] = [0.0, 0.0, 0.0, 0.0]
    netout[0, 0, 0, 4] = 10.0          # sigmoid→~1
    netout[0, 0, 0, 5] = 10.0
    boxes, scores = decode_yolo3_netout(
        jnp.asarray(netout), jnp.asarray([[16.0, 32.0]]),
        net_size=(64, 64), obj_threshold=0.1)
    np.testing.assert_allclose(np.asarray(boxes[0]),
                               [0.5, 0.5, 16 / 64, 32 / 64], rtol=1e-5)
    assert float(scores[0, 0]) > 0.9


@pytest.mark.slow   # full-size stream + full-width forward; the
#                       stock-scale rehearsal (test_weights_fullsize)
#                       pins the same cross-loader bit-exactness at 416
def test_cfg_model_matches_darknet19_bitexact():
    """The compiled yolov2 cfg must reproduce the hand-built Darknet19
    module exactly when both ingest the same .weights stream."""
    from object_tracking_tpu.models.darknet19 import Darknet19
    from object_tracking_tpu.ops.weights import load_yolov2_weights
    from tests.test_models import make_fake_weights_file

    path = make_fake_weights_file(num_classes=3)
    try:
        # Hand-built module path.
        ref = Darknet19(num_classes=3, num_anchors=5)
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
        ref_vars = ref.init(jax.random.PRNGKey(0), x)
        loaded = load_yolov2_weights(path, num_classes=3)
        ref_vars = {
            'params': {**ref_vars['params'], **{
                k: {p: jnp.asarray(v) for p, v in d.items()}
                for k, d in loaded['params'].items()}},
            'batch_stats': {
                k: {p: jnp.asarray(v) for p, v in d.items()}
                for k, d in loaded['batch_stats'].items()}}
        ref_out = ref.apply(ref_vars, x, train=False)['netout']

        # Compiled-cfg path.
        model, _ = build_from_cfg(YOLOV2_CFG)
        cfg_loaded = load_weights_for_cfg(path, YOLOV2_CFG)
        cfg_vars = jax.tree_util.tree_map(jnp.asarray, cfg_loaded)
        out = model.apply(cfg_vars, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(out['heads'][0]), np.asarray(ref_out))
    finally:
        os.unlink(path)


def test_weight_loader_rejects_mismatched_cfg():
    from tests.test_models import make_fake_weights_file
    path = make_fake_weights_file(num_classes=3)
    try:
        with pytest.raises(ValueError, match='mismatch'):
            load_weights_for_cfg(path, TINY_CFG)
    finally:
        os.unlink(path)


def test_cfg_detector_end_to_end(tmp_path):
    """CfgDetector: cfg text + synthetic weights + image file → detections
    list and drawn output (the reference's YOLO.detect/predict surface)."""
    import cv2
    from object_tracking_tpu.models.darknet_cfg import CfgDetector
    from tests.test_models import make_fake_weights_file

    path = make_fake_weights_file(num_classes=3)
    try:
        det = CfgDetector(YOLOV2_CFG, weights_path=path,
                          labels=('a', 'b', 'c'), obj_threshold=0.0)
        img = (np.random.RandomState(0).rand(96, 128, 3) * 255
               ).astype(np.uint8)
        img_path = str(tmp_path / 'in.jpg')
        out_path = str(tmp_path / 'out.jpg')
        cv2.imwrite(img_path, img)
        dets = det.predict(img_path, out_path)
        assert os.path.exists(out_path)
        assert all(d[0] in ('a', 'b', 'c') for d in dets)
        assert all(len(d[2]) == 4 for d in dets)
        # scores sorted descending
        scores = [d[1] for d in dets]
        assert scores == sorted(scores, reverse=True)
    finally:
        os.unlink(path)


def test_unsupported_section_raises():
    with pytest.raises(ValueError, match='unsupported'):
        compile_cfg(parse_darknet_cfg(
            '[net]\nheight=32\nwidth=32\nchannels=3\n[gru]\n'))


def test_yolo_multihead_training_converges():
    """Standalone multi-head [yolo] training (the round-3
    NotImplementedError, trainer.py): summed per-head yolo_loss over
    multi-scale targets drives the loss down on a fixed batch."""
    from object_tracking_tpu.ops.targets import encode_targets_multiscale
    from object_tracking_tpu.training import (
        TrainState, make_multihead_detector_train_step, make_optimizer)

    model, _ = build_from_cfg(V3_CFG)
    size = 32
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))
    shapes = jax.eval_shape(
        lambda x: model.apply(variables, x, train=False),
        jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32))
    from object_tracking_tpu.models.darknet_cfg import head_specs
    specs = head_specs(model.plan)
    heads = tuple(
        (tuple(float(v) for v in
               np.asarray(s['anchors'], np.float32).reshape(-1)),
         int(hs.shape[1]), int(hs.shape[2]), s['num_classes'])
        for s, hs in zip(specs, shapes['heads']))
    assert len(heads) == 2 and heads[0][1] != heads[1][1]  # two scales

    rng = np.random.RandomState(0)
    b = 4
    images = rng.rand(b, size, size, 3).astype(np.float32)
    boxes = np.tile(np.asarray([[6.0, 4.0, 22.0, 30.0],
                                [2.0, 2.0, 30.0, 26.0]], np.float32),
                    (b, 1, 1))
    cls = np.tile(np.asarray([0, 1], np.int32), (b, 1))
    valid = np.ones((b, 2), bool)
    ys, bs = jax.vmap(lambda bx, c, v: encode_targets_multiscale(
        bx, c, v, heads, image_h=size, image_w=size,
        true_box_buffer=4))(jnp.asarray(boxes), jnp.asarray(cls),
                            jnp.asarray(valid))
    batch = {'images': images,
             'y_true': tuple(np.asarray(a) for a in ys),
             'true_boxes': tuple(np.asarray(a) for a in bs)}

    step = make_multihead_detector_train_step(heads, (size, size))
    state = TrainState.create(model.apply, variables,
                              make_optimizer(1e-3))
    losses = []
    for _ in range(40):
        state, metrics = step(state, dict(batch))
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
