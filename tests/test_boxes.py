import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.ops import (
    cxcywh_to_xyxy, iou_center, iou_corner, pairwise_iou_center,
    xyxy_to_cxcywh,
)


def ref_interval_overlap(interval_a, interval_b):
    """Scalar mirror of reference utility/utils.py:175-188."""
    x1, x2 = interval_a
    x3, x4 = interval_b
    if x3 < x1:
        if x4 < x1:
            return 0
        return min(x2, x4) - x1
    if x2 < x3:
        return 0
    return min(x2, x4) - x3


def ref_bbox_iou(b1, b2):
    """Scalar mirror of reference utility/utils.py:155-173 (center fmt)."""
    iw = ref_interval_overlap([b1[0] - b1[2] / 2, b1[0] + b1[2] / 2],
                              [b2[0] - b2[2] / 2, b2[0] + b2[2] / 2])
    ih = ref_interval_overlap([b1[1] - b1[3] / 2, b1[1] + b1[3] / 2],
                              [b2[1] - b2[3] / 2, b2[1] + b2[3] / 2])
    inter = iw * ih
    union = b1[2] * b1[3] + b2[2] * b2[3] - inter
    return float(inter) / union


def test_iou_center_matches_reference_semantics(rng):
    a = rng.uniform(0.1, 5.0, size=(64, 4)).astype(np.float32)
    b = rng.uniform(0.1, 5.0, size=(64, 4)).astype(np.float32)
    got = np.asarray(iou_center(jnp.array(a), jnp.array(b)))
    want = np.array([ref_bbox_iou(x, y) for x, y in zip(a, b)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_iou_identity_and_disjoint():
    box = jnp.array([1.0, 1.0, 2.0, 2.0])
    assert float(iou_center(box, box)) > 0.999
    far = jnp.array([10.0, 10.0, 2.0, 2.0])
    assert float(iou_center(box, far)) == 0.0


def test_iou_corner_known_value():
    a = jnp.array([0.0, 0.0, 2.0, 2.0])   # area 4
    b = jnp.array([1.0, 1.0, 3.0, 3.0])   # area 4, intersect 1
    np.testing.assert_allclose(float(iou_corner(a, b)), 1.0 / 7.0,
                               rtol=1e-5)


def test_format_roundtrip(rng):
    boxes = rng.uniform(0.1, 5.0, size=(32, 4)).astype(np.float32)
    back = np.asarray(xyxy_to_cxcywh(cxcywh_to_xyxy(jnp.array(boxes))))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-6)


def test_pairwise_shape(rng):
    a = jnp.array(rng.uniform(0.1, 5.0, size=(7, 4)).astype(np.float32))
    b = jnp.array(rng.uniform(0.1, 5.0, size=(9, 4)).astype(np.float32))
    m = pairwise_iou_center(a, b)
    assert m.shape == (7, 9)
    np.testing.assert_allclose(np.diag(np.asarray(
        pairwise_iou_center(a, a))), 1.0, rtol=1e-4)
