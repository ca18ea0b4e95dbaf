"""Target encoder + heatmap codec parity tests against numpy mirrors of the
reference semantics (preprocessing.py:214-293, utils.py:53-79)."""

import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.ops import (
    encode_targets, heatmap_decode_rect, heatmap_encode,
)
from object_tracking_tpu.ops.targets import encode_targets_batch

from tests.test_boxes import ref_bbox_iou

ANCHORS = np.array([0.57273, 0.677385, 1.87446, 2.06253, 3.33843,
                    5.47434, 7.88282, 3.52778, 9.77052, 9.16828],
                   np.float32)


def ref_encode(objs, image_w=416, image_h=416, grid_w=13, grid_h=13,
               num_classes=3, buf=50, anchors=ANCHORS):
    """Numpy mirror of BatchGenerator.output_from_instance target writes
    (preprocessing.py:225-270)."""
    na = len(anchors) // 2
    y = np.zeros((grid_h, grid_w, na, 5 + num_classes), np.float32)
    b = np.zeros((1, 1, 1, buf, 4), np.float32)
    tbi = 0
    for (xmin, ymin, xmax, ymax, cls) in objs:
        if not (xmax > xmin and ymax > ymin and 0 <= cls < num_classes):
            continue
        cx = 0.5 * (xmin + xmax) / (float(image_w) / grid_w)
        cy = 0.5 * (ymin + ymax) / (float(image_h) / grid_h)
        gx, gy = int(np.floor(cx)), int(np.floor(cy))
        if gx < grid_w and gy < grid_h:
            cw = (xmax - xmin) / (float(image_w) / grid_w)
            ch = (ymax - ymin) / (float(image_h) / grid_h)
            best, best_iou = -1, -1
            for i in range(na):
                iou = ref_bbox_iou([0, 0, cw, ch],
                                   [0, 0, anchors[2 * i], anchors[2 * i + 1]])
                if iou > best_iou:
                    best, best_iou = i, iou
            y[gy, gx, best, 0:4] = [cx, cy, cw, ch]
            y[gy, gx, best, 4] = 1.0
            y[gy, gx, best, 5 + cls] = 1.0
            b[0, 0, 0, tbi] = [cx, cy, cw, ch]
            tbi = (tbi + 1) % buf
    return y, b


def random_objs(rng, n, num_classes=3, img=416):
    objs = []
    for _ in range(n):
        x1, y1 = rng.uniform(0, img - 40, 2)
        w, h = rng.uniform(8, 200, 2)
        objs.append((x1, y1, min(x1 + w, img), min(y1 + h, img),
                     rng.randint(num_classes)))
    return objs


def to_arrays(objs, m=50):
    boxes = np.zeros((m, 4), np.float32)
    cls = np.full((m,), -1, np.int32)
    valid = np.zeros((m,), bool)
    for i, (x1, y1, x2, y2, c) in enumerate(objs):
        boxes[i] = [x1, y1, x2, y2]
        cls[i] = c
        valid[i] = True
    return boxes, cls, valid


def test_encode_matches_reference(rng):
    objs = random_objs(rng, 12)
    boxes, cls, valid = to_arrays(objs)
    y, b = encode_targets(jnp.array(boxes), jnp.array(cls),
                          jnp.array(valid), jnp.array(ANCHORS),
                          num_classes=3)
    want_y, want_b = ref_encode(objs)
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), want_b, rtol=1e-4, atol=1e-4)


def test_encode_skips_degenerate_and_out_of_grid():
    objs = [(10, 10, 10, 50, 0),      # zero width → skipped
            (0, 0, 416, 416, 1),      # center on grid edge → grid 6,6 ok
            (410, 410, 500, 500, 2)]  # center beyond grid → skipped
    boxes, cls, valid = to_arrays(objs)
    y, b = encode_targets(jnp.array(boxes), jnp.array(cls),
                          jnp.array(valid), jnp.array(ANCHORS),
                          num_classes=3)
    want_y, want_b = ref_encode(objs)
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), want_b, rtol=1e-4, atol=1e-4)
    assert float(jnp.sum(y[..., 4])) == 1.0


def test_encode_batch_vmap(rng):
    objs = random_objs(rng, 5)
    boxes, cls, valid = to_arrays(objs)
    yb, bb = encode_targets_batch(
        jnp.array(boxes)[None].repeat(3, 0),
        jnp.array(cls)[None].repeat(3, 0),
        jnp.array(valid)[None].repeat(3, 0),
        jnp.array(ANCHORS), num_classes=3)
    assert yb.shape == (3, 13, 13, 5, 8)
    assert bb.shape == (3, 1, 1, 1, 50, 4)
    np.testing.assert_allclose(np.asarray(yb[0]), np.asarray(yb[2]))


def ref_heatmap(x, y, w, h, hmap=32):
    """Numpy mirror of utils.py:53-58 with clamped (non-wrapping) start."""
    heat = np.zeros((hmap, hmap))
    sx, sy, sh, sw = int(x * hmap), int(y * hmap), int(h * hmap), int(w * hmap)
    heat[max(sy, 0):(sy + sh + 1), max(sx, 0):(sx + sw + 1)] = 1.0
    return heat.reshape(-1)


def test_heatmap_encode_matches_reference(rng):
    for _ in range(20):
        x, y = rng.uniform(0, 0.8, 2)
        w, h = rng.uniform(0.05, 0.4, 2)
        got = np.asarray(heatmap_encode(x, y, w, h))
        np.testing.assert_allclose(got, ref_heatmap(x, y, w, h))


def test_heatmap_roundtrip():
    heat = heatmap_encode(0.25, 0.5, 0.25, 0.125, hmap_size=32)
    x1, y1, x2, y2 = heatmap_decode_rect(heat, 0.75, 32)
    assert (int(x1), int(y1)) == (8, 16)
    assert (int(x2), int(y2)) == (16, 20)


def test_heatmap_empty_sentinel():
    empty = jnp.zeros((32 * 32,), jnp.float32)
    x1, y1, x2, y2 = heatmap_decode_rect(empty, 0.75, 32)
    assert (int(x1), int(y1), int(x2), int(y2)) == (32, 32, -1, -1)


def test_encode_targets_multiscale_ownership():
    """v3 multi-scale encoding: each GT box lands in exactly the head
    owning its globally best-IoU (pixel) anchor; every head's true-box
    buffer carries ALL boxes in that head's cell units."""
    from object_tracking_tpu.ops.targets import encode_targets_multiscale

    heads = (
        ((10.0, 13.0, 16.0, 30.0, 33.0, 23.0), 4, 4, 2),   # small anchors
        ((80.0, 80.0, 120.0, 100.0), 2, 2, 2),             # big anchors
    )
    img = 128
    boxes = jnp.asarray([[10.0, 10.0, 26.0, 40.0],    # 16x30 → head 0, a1
                         [4.0, 14.0, 122.0, 116.0]],  # 118x102 → head 1, a1
                        jnp.float32)
    cls = jnp.asarray([0, 1], jnp.int32)
    valid = jnp.asarray([True, True])
    ys, bs = encode_targets_multiscale(boxes, cls, valid, heads,
                                       image_h=img, image_w=img,
                                       true_box_buffer=4)
    y0, y1 = np.asarray(ys[0]), np.asarray(ys[1])
    # Small box: center (18, 25) px → head-0 cell (gx=0, gy=0 at 32 px
    # cells), anchor 1 (16x30); absent from head 1.
    assert y0[0, 0, 1, 4] == 1.0
    assert y0.sum(axis=(0, 1, 2))[4] == 1.0            # exactly one hit
    # Big box: center (63, 65) px → head-1 cell (0, 1 at 64 px cells),
    # anchor 1 (120x100); absent from head 0.
    assert y1[1, 0, 1, 4] == 1.0
    assert y1.sum(axis=(0, 1, 2))[4] == 1.0
    # Both buffers hold BOTH boxes (cell units differ per head).
    b0 = np.asarray(bs[0]).reshape(-1, 4)
    b1 = np.asarray(bs[1]).reshape(-1, 4)
    assert (b0[:2, 2] > 0).all() and (b1[:2, 2] > 0).all()
    np.testing.assert_allclose(b0[0, 2] * 128 / 4, 16.0)   # w in px
    np.testing.assert_allclose(b1[1, 3] * 128 / 2, 102.0)  # h in px
