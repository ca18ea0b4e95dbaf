"""VGG16 prior source: shapes, layer dims, delegate wiring, npz weights."""

import numpy as np
import pytest

from object_tracking_tpu.models import FakeDetector, VGG16PriorSource


@pytest.fixture(scope='module')
def source():
    return VGG16PriorSource(
        image_h=64, image_w=64,
        detection_delegate=FakeDetector(feat_shape=(2, 2, 4)))


def test_layer_dims(source):
    assert source.get_layer_dims('conv5_3') == (4, 4, 512)
    assert source.get_layer_dims('pool5') == (2, 2, 512)
    assert source.get_layer_dims('fc7') == (1, 1, 4096)
    with pytest.raises(KeyError):
        source.get_layer_dims('nope')


@pytest.mark.parametrize('layer', ['conv5_3', 'pool5', 'fc7'])
def test_forward_batch_shapes(source, rng, layer):
    images = rng.rand(2, 64, 64, 3).astype(np.float32)
    feats, boxes, labels, scores, valid = source.forward_batch(
        images, layer=layer, top_k=8)
    assert feats.shape == (2,) + source.get_layer_dims(layer)
    assert boxes.shape == (2, 8, 4)
    assert valid[:, 0].all()          # FakeDetector emits one valid box
    assert np.isfinite(feats).all()


def test_no_delegate_gives_empty_boxes(rng):
    src = VGG16PriorSource(image_h=32, image_w=32)
    images = rng.rand(1, 32, 32, 3).astype(np.float32)
    _, boxes, _, _, valid = src.forward_batch(images, layer='pool5')
    assert not valid.any()
    assert (boxes == 0).all()


def test_npz_weight_roundtrip(tmp_path, rng):
    src = VGG16PriorSource(image_h=32, image_w=32)
    kern = rng.randn(3, 3, 3, 64).astype(np.float32) * 0.01
    bias = rng.randn(64).astype(np.float32)
    path = tmp_path / 'w.npz'
    np.savez(path, **{'conv1_1/kernel': kern, 'conv1_1/bias': bias})
    src.load_npz_weights(str(path))
    np.testing.assert_array_equal(
        np.asarray(src.variables['params']['conv1_1']['kernel']), kern)
    np.testing.assert_array_equal(
        np.asarray(src.variables['params']['conv1_1']['bias']), bias)


# ---------------------------------------------------------------------------
# Dense detection head: the FasterRCNN capability (per-class NMS'd
# detections AND features from ONE model, FasterRCNN.py:62-81).
# ---------------------------------------------------------------------------
def _headed_source(bias):
    # width-divided (same topology as the committed golden fixture):
    # these tests check head mechanism, not capacity (1-core CI host)
    src = VGG16PriorSource(image_h=64, image_w=64, det_labels=('a', 'b'),
                           conf_threshold=0.8, nms_threshold=0.3,
                           width_div=8, fc_features=128)
    import flax
    params = flax.core.unfreeze(src.variables['params'])
    params['det_head']['kernel'] = np.zeros_like(
        np.asarray(params['det_head']['kernel']))
    params['det_head']['bias'] = np.asarray(bias, np.float32)
    src.variables = {'params': params}
    return src


def test_det_head_produces_per_class_detections(rng):
    # kernel=0, bias fires class 'b' with high confidence in every cell;
    # per-class NMS at 0.3 collapses the overlapping cell boxes.
    src = _headed_source([0, 0, 0, 0, 10.0, -5.0, 5.0])
    images = rng.rand(1, 64, 64, 3).astype(np.float32)
    feats, boxes, labels, scores, valid = src.forward_batch(
        images, layer='fc7', top_k=8)
    assert valid.any()
    assert (labels[valid] == 1).all()          # class 'b'
    assert (scores[valid] > 0.9).all()
    assert feats.shape == (1, 1, 1, 128)


def test_det_head_below_conf_threshold_is_empty(rng):
    # conf logit 0 → sigmoid = 0.5 < CONF_THRESH 0.8 (FasterRCNN.py:63).
    src = _headed_source([0, 0, 0, 0, 0.0, -5.0, 5.0])
    images = rng.rand(1, 64, 64, 3).astype(np.float32)
    _, _, _, _, valid = src.forward_batch(images, layer='fc7', top_k=8)
    assert not valid.any()


def test_det_head_extract_spatio_info(tmp_path, rng):
    import cv2
    src = _headed_source([0, 0, 0, 0, 10.0, 5.0, -5.0])
    path = str(tmp_path / 'img.jpg')
    cv2.imwrite(path, rng.randint(0, 255, (64, 64, 3)).astype(np.uint8))
    named, feats = src.extract_spatio_info(path, layer='fc7')
    assert named and named[0][0] == 'a'
    assert feats.shape == (1, 1, 128)
    # class_filter drops non-matching classes (YOLO.py:172-180 semantics)
    named_f, _ = src.extract_spatio_info(path, class_filter=('b',))
    assert named_f == []


def test_det_head_trains_one_step(rng):
    from object_tracking_tpu.models.vgg16 import VGG_DET_ANCHOR
    from object_tracking_tpu.training import (
        TrainState, make_detector_train_step, make_optimizer)

    src = VGG16PriorSource(image_h=64, image_w=64, det_labels=('a', 'b'),
                           width_div=8, fc_features=128)
    state = TrainState.create(src.det_apply, src.variables,
                              make_optimizer(1e-3))
    step = make_detector_train_step(VGG_DET_ANCHOR)
    y = np.zeros((2, 2, 2, 1, 7), np.float32)
    y[:, 0, 0, 0] = [0.5, 0.5, 1.0, 1.0, 1.0, 1.0, 0.0]
    batch = {'images': rng.rand(2, 64, 64, 3).astype(np.float32),
             'y_true': y,
             'true_boxes': np.zeros((2, 1, 1, 1, 4, 4), np.float32)}
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    assert int(state2.step) == 1


def test_npz_ingests_det_head(tmp_path, rng):
    src = VGG16PriorSource(image_h=32, image_w=32, det_labels=('a',),
                           width_div=8, fc_features=128)
    kern = rng.randn(1, 1, 64, 6).astype(np.float32) * 0.01
    path = tmp_path / 'w.npz'
    np.savez(path, **{'det_head/kernel': kern})
    src.load_npz_weights(str(path))
    np.testing.assert_array_equal(
        np.asarray(src.variables['params']['det_head']['kernel']), kern)
