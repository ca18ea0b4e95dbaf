"""Caffemodel binary-format ingestion (ops/caffemodel.py) — the format
rehearsal for the second native backend's weights, mirroring the darknet
rehearsal of tests/test_weights_fullsize.py. The reference loads
VGG16_faster_rcnn_final.caffemodel through pycaffe
(models_detection/FasterRCNN.py:37-38,49-51); downloading the real file
is blocked offline (PARITY.md), so these tests synthesize files with the
exact stock layer layout (both protobuf encodings) and pin the
write → parse → map → forward chain."""

import numpy as np
import pytest

from object_tracking_tpu.ops.caffemodel import (
    VGG16_CAFFE_LAYERS, caffemodel_to_vgg16_params, load_caffemodel_into,
    read_caffemodel, write_caffemodel)


def _synth_layers(rng, width_div=8, fc_features=64):
    """Random blobs in caffe layouts at a width-divided VGG16 scale."""
    layers = []
    prev = 3
    for name, stock in VGG16_CAFFE_LAYERS:
        if name.startswith('conv'):
            width = max(stock // width_div, 4)
            w = rng.randn(width, prev, 3, 3).astype(np.float32)
            prev = width
        elif name == 'fc6':
            w = rng.randn(fc_features, prev * 7 * 7).astype(np.float32)
            prev = fc_features
        else:
            w = rng.randn(fc_features, fc_features).astype(np.float32)
        b = rng.randn(w.shape[0]).astype(np.float32)
        layers.append((name, [w, b]))
    return layers


@pytest.mark.parametrize('v1', [True, False])
def test_roundtrip_both_encodings(tmp_path, rng, v1):
    layers = _synth_layers(rng)
    path = str(tmp_path / f'synth_{v1}.caffemodel')
    write_caffemodel(path, layers, v1=v1)
    back = read_caffemodel(path)
    assert set(back) == {n for n, _ in layers}
    for name, blobs in layers:
        assert len(back[name]) == len(blobs)
        for a, b in zip(blobs, back[name]):
            # V1 legacy dims left-pad to NCHW and strip leading 1s on
            # read, so a 2-D fc matrix survives; shapes must round-trip
            # up to that canonicalization, data exactly.
            np.testing.assert_array_equal(
                np.asarray(a).reshape(b.shape), b)


def test_mapping_matches_npz_path(tmp_path, rng):
    """caffemodel ingestion must land the same parameters as the
    established npz path: identical fc7 outputs from both."""
    from object_tracking_tpu.models import VGG16PriorSource
    layers = _synth_layers(rng)
    cpath = str(tmp_path / 'synth.caffemodel')
    write_caffemodel(cpath, layers, v1=True)

    mapped = caffemodel_to_vgg16_params(read_caffemodel(cpath),
                                        fc_features=64)
    npz_path = str(tmp_path / 'synth.npz')
    np.savez(npz_path, **mapped)

    a = VGG16PriorSource(image_h=64, image_w=64, width_div=8,
                         fc_features=64)
    b = VGG16PriorSource(image_h=64, image_w=64, width_div=8,
                         fc_features=64, weights_path=npz_path)
    load_caffemodel_into(a, cpath)

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    fa, *_ = a.forward_batch(x)
    fb, *_ = b.forward_batch(x)
    np.testing.assert_allclose(fa, fb, rtol=1e-6, atol=1e-6)
    # and the ingest actually changed the random init
    c = VGG16PriorSource(image_h=64, image_w=64, width_div=8,
                         fc_features=64)
    fc, *_ = c.forward_batch(x)
    assert np.abs(fa - fc).max() > 1e-3


def test_shape_mismatch_rejected(tmp_path, rng):
    from object_tracking_tpu.models import VGG16PriorSource
    layers = _synth_layers(rng, width_div=8, fc_features=64)
    path = str(tmp_path / 'synth.caffemodel')
    write_caffemodel(path, layers, v1=True)
    wrong = VGG16PriorSource(image_h=64, image_w=64, width_div=4,
                             fc_features=64)
    with pytest.raises((ValueError, KeyError)):
        load_caffemodel_into(wrong, path)


def test_missing_layer_rejected(tmp_path, rng):
    layers = _synth_layers(rng)[:-1]          # drop fc7
    path = str(tmp_path / 'partial.caffemodel')
    write_caffemodel(path, layers, v1=True)
    with pytest.raises(KeyError):
        caffemodel_to_vgg16_params(read_caffemodel(path), fc_features=64)


def test_not_a_caffemodel_rejected(tmp_path):
    path = str(tmp_path / 'junk.caffemodel')
    with open(path, 'wb') as f:
        f.write(b'\x00' * 64)
    with pytest.raises(ValueError):
        read_caffemodel(path)


@pytest.mark.slow
def test_stock_scale_rehearsal(tmp_path):
    """Full-size stock layout: the ~553 MB synthesized twin of
    VGG16_faster_rcnn_final.caffemodel in the V1 encoding 2015-era
    Faster-RCNN models use. After this passes, the ONLY untested step on
    the reference's FasterRCNN weight path is the download itself —
    exactly the status the darknet format reached in round 4."""
    from object_tracking_tpu.models import VGG16PriorSource
    rng = np.random.RandomState(0)
    layers = _synth_layers(rng, width_div=1, fc_features=4096)
    n_params = sum(int(np.prod(b.shape)) for _, bl in layers
                   for b in bl)
    assert n_params > 130_000_000             # genuinely stock-scale
    path = str(tmp_path / 'vgg16_stock.caffemodel')
    write_caffemodel(path, layers, v1=True)

    back = read_caffemodel(path)
    for name, blobs in layers:                # byte-exact round trip
        for a, b in zip(blobs, back[name]):
            np.testing.assert_array_equal(
                np.asarray(a).reshape(b.shape), b)

    src = VGG16PriorSource(image_h=224, image_w=224)
    load_caffemodel_into(src, path)
    x = rng.rand(1, 224, 224, 3).astype(np.float32)
    feats, *_ = src.forward_batch(x)
    assert feats.shape == (1, 1, 1, 4096)
    assert np.all(np.isfinite(feats))
    # pinned: the ingest is deterministic end to end
    src2 = VGG16PriorSource(image_h=224, image_w=224)
    load_caffemodel_into(src2, path)
    feats2, *_ = src2.forward_batch(x)
    np.testing.assert_allclose(feats, feats2, rtol=0, atol=0)
