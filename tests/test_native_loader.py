"""Tests for the native C++ data runtime (native/ott_dataio.cpp) through
its ctypes boundary — decode/resize parity against cv2 and NMS parity
against the device op. Skipped wholesale if the toolchain can't produce
libottdata.so."""

import numpy as np
import pytest

from object_tracking_tpu.data import native_loader

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason='libottdata.so unavailable')


@pytest.fixture(scope='module')
def image_files(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('imgs')
    rng = np.random.RandomState(0)
    # Smooth content so JPEG decode differences stay tiny.
    base = cv2.GaussianBlur(
        rng.randint(0, 255, (96, 128, 3), np.uint8), (15, 15), 5)
    jpg = str(root / 'a.jpg')
    png = str(root / 'b.png')
    cv2.imwrite(jpg, base, [cv2.IMWRITE_JPEG_QUALITY, 98])
    cv2.imwrite(png, base)
    return jpg, png, base


def _cv2_load(path, net_h, net_w):
    import cv2
    img = cv2.imread(path)
    img = cv2.resize(img, (net_w, net_h))[:, :, ::-1]
    return np.asarray(img, np.float32) / 255.0


def test_image_size(image_files):
    jpg, png, base = image_files
    assert native_loader.image_size(jpg) == base.shape[:2]
    assert native_loader.image_size(png) == base.shape[:2]


def test_png_decode_resize_matches_cv2(image_files):
    _, png, _ = image_files
    ours = native_loader.load_image(png, 64, 64)
    ref = _cv2_load(png, 64, 64)
    assert ours.shape == (64, 64, 3)
    # PNG decode is lossless; only bilinear rounding differs.
    assert np.abs(ours - ref).mean() < 0.01
    assert np.abs(ours - ref).max() < 0.05


def test_jpeg_decode_close_to_cv2(image_files):
    jpg, _, _ = image_files
    ours = native_loader.load_image(jpg, 96, 128)  # no resize
    ref = _cv2_load(jpg, 96, 128)
    # Different IDCT implementations may differ by a few LSBs.
    assert np.abs(ours - ref).mean() < 0.02


def test_load_batch_matches_single(image_files):
    jpg, png, _ = image_files
    batch = native_loader.load_batch([jpg, png, jpg], 64, 48, n_threads=2)
    assert batch.shape == (3, 64, 48, 3)
    np.testing.assert_array_equal(batch[0],
                                  native_loader.load_image(jpg, 64, 48))
    np.testing.assert_array_equal(batch[1],
                                  native_loader.load_image(png, 64, 48))
    np.testing.assert_array_equal(batch[0], batch[2])


def test_load_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        native_loader.load_image(str(tmp_path / 'nope.jpg'), 32, 32)
    with pytest.raises(FileNotFoundError):
        native_loader.load_batch([str(tmp_path / 'nope.jpg')], 32, 32)


def test_nms_matches_device_op(rng):
    import jax.numpy as jnp

    from object_tracking_tpu.ops.nms import greedy_nms_scores

    n, c = 40, 3
    boxes = np.stack([rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
                      rng.uniform(0.05, 0.4, n),
                      rng.uniform(0.05, 0.4, n)], -1).astype(np.float32)
    scores = rng.rand(n, c).astype(np.float32)
    scores[scores < 0.5] = 0.0

    native = native_loader.nms_scores(boxes, scores, 0.45)
    dev_boxes, dev_scores = greedy_nms_scores(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, top_k=0)
    np.testing.assert_array_equal(np.asarray(dev_boxes), boxes)
    np.testing.assert_allclose(np.asarray(dev_scores), native, atol=1e-6)


def test_load_batch_u8_matches_f32(image_files):
    """The uint8 raw-mode path is the f32 path minus /255, to rounding:
    u8 == round(f32 * 255) within 1 LSB (same decode, same separable
    bilinear geometry)."""
    jpg, png, _ = image_files
    u8 = native_loader.load_batch_u8([jpg, png], 64, 48, n_threads=2)
    f32 = native_loader.load_batch([jpg, png], 64, 48, n_threads=2)
    assert u8.shape == (2, 64, 48, 3) and u8.dtype == np.uint8
    assert np.abs(u8.astype(np.float32) - f32 * 255.0).max() <= 1.0


def test_load_batch_u8_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        native_loader.load_batch_u8([str(tmp_path / 'nope.jpg')], 32, 32)
