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
