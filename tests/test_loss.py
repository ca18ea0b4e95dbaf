"""YOLO loss golden tests: numpy mirror + hand-computed micro-grid case
(reference semantics: models_detection/KerasYOLO.py:81-234)."""

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.models.losses import (
    binary_crossentropy, heatmap_accuracy, yolo_loss,
)

ANCHORS = np.array([0.57273, 0.677385, 1.87446, 2.06253, 3.33843,
                    5.47434, 7.88282, 3.52778, 9.77052, 9.16828],
                   np.float32)


def np_yolo_loss(y_pred, y_true, tboxes, anchors,
                 object_scale=5.0, no_object_scale=1.0, coord_scale=1.0,
                 class_scale=1.0, best_iou_threshold=0.6):
    """Straight numpy transcription of the loss math (KerasYOLO.py:81-214),
    loop-free, written independently of the jax implementation."""
    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    b, gh, gw, na, _ = y_pred.shape
    nc = y_pred.shape[-1] - 5
    anchors = anchors.reshape(1, 1, 1, na, 2)
    cell = np.zeros((1, gh, gw, na, 2), np.float32)
    cell[..., 0] = np.arange(gw)[None, None, :, None]
    cell[..., 1] = np.arange(gh)[None, :, None, None]

    pxy = sigmoid(y_pred[..., :2]) + cell
    pwh = np.exp(y_pred[..., 2:4]) * anchors
    pconf = sigmoid(y_pred[..., 4])
    pclass = y_pred[..., 5:]

    txy, twh, obj = y_true[..., :2], y_true[..., 2:4], y_true[..., 4]

    def iou(axy, awh, bxy, bwh):
        amin, amax = axy - awh / 2, axy + awh / 2
        bmin, bmax = bxy - bwh / 2, bxy + bwh / 2
        iw = np.maximum(np.minimum(amax[..., 0], bmax[..., 0])
                        - np.maximum(amin[..., 0], bmin[..., 0]), 0)
        ih = np.maximum(np.minimum(amax[..., 1], bmax[..., 1])
                        - np.maximum(amin[..., 1], bmin[..., 1]), 0)
        inter = iw * ih
        return inter / (awh[..., 0] * awh[..., 1]
                        + bwh[..., 0] * bwh[..., 1] - inter + 1e-10)

    tconf = iou(pxy, pwh, txy, twh) * obj
    tclass = np.argmax(y_true[..., 5:], -1)

    coord_mask = obj[..., None] * coord_scale
    best = iou(pxy[..., None, :], pwh[..., None, :],
               tboxes[..., :2], tboxes[..., 2:4]).max(4)
    conf_mask = ((best < best_iou_threshold) * (1 - obj) * no_object_scale
                 + obj * object_scale)
    class_mask = obj * class_scale

    nc_box = (coord_mask > 0).sum()
    nf_box = (conf_mask > 0).sum()
    ncl_box = (class_mask > 0).sum()

    lxy = (np.square(txy - pxy) * coord_mask).sum() / (nc_box + 1e-6) / 2
    lwh = (np.square(twh - pwh) * coord_mask).sum() / (nc_box + 1e-6) / 2
    lconf = (np.square(tconf - pconf) * conf_mask).sum() / (nf_box + 1e-6) / 2
    z = pclass - pclass.max(-1, keepdims=True)
    logsm = z - np.log(np.exp(z).sum(-1, keepdims=True))
    ce = -np.take_along_axis(logsm, tclass[..., None], -1)[..., 0]
    lclass = (ce * class_mask).sum() / (ncl_box + 1e-6)
    return lxy + lwh + lconf + lclass, dict(
        loss_xy=lxy, loss_wh=lwh, loss_conf=lconf, loss_class=lclass)


def make_case(rng, b=2, gh=5, gw=5, na=5, nc=4, nobj=6):
    y_pred = (rng.randn(b, gh, gw, na, 5 + nc) * 0.5).astype(np.float32)
    y_true = np.zeros((b, gh, gw, na, 5 + nc), np.float32)
    tboxes = np.zeros((b, 1, 1, 1, 50, 4), np.float32)
    for bi in range(b):
        for k in range(nobj):
            gy, gx, a = rng.randint(gh), rng.randint(gw), rng.randint(na)
            box = [gx + rng.rand(), gy + rng.rand(),
                   rng.uniform(0.3, 3), rng.uniform(0.3, 3)]
            y_true[bi, gy, gx, a, :4] = box
            y_true[bi, gy, gx, a, 4] = 1
            y_true[bi, gy, gx, a, 5 + rng.randint(nc)] = 1
            tboxes[bi, 0, 0, 0, k] = box
    return y_pred, y_true, tboxes


def test_loss_matches_numpy_mirror(rng):
    y_pred, y_true, tboxes = make_case(rng)
    want, want_aux = np_yolo_loss(y_pred, y_true, tboxes, ANCHORS)
    got, aux = yolo_loss(jnp.array(y_pred), jnp.array(y_true),
                         jnp.array(tboxes), jnp.array(ANCHORS))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)
    for k in ('loss_xy', 'loss_wh', 'loss_conf', 'loss_class'):
        np.testing.assert_allclose(float(aux[k]), want_aux[k], rtol=1e-4,
                                   atol=1e-6)


def test_loss_hand_computed_micro_case():
    """1x1 grid, 1 anchor, 2 classes; prediction exactly on target."""
    anchors = np.array([2.0, 2.0], np.float32)
    # logits: xy=0 → sigmoid 0.5 → pred center (0.5, 0.5); wh=0 → 2.0 prior
    y_pred = np.zeros((1, 1, 1, 1, 7), np.float32)
    y_pred[..., 4] = 100.0            # conf → sigmoid ≈ 1
    y_pred[..., 5] = 100.0            # class 0 certain
    y_true = np.zeros((1, 1, 1, 1, 7), np.float32)
    y_true[..., 0:4] = [0.5, 0.5, 2.0, 2.0]
    y_true[..., 4] = 1.0
    y_true[..., 5] = 1.0
    tboxes = np.zeros((1, 1, 1, 1, 50, 4), np.float32)
    tboxes[..., 0, :] = [0.5, 0.5, 2.0, 2.0]
    loss, aux = yolo_loss(jnp.array(y_pred), jnp.array(y_true),
                          jnp.array(tboxes), jnp.array(anchors))
    # perfect prediction: IoU = 1 → conf target 1 = pred; xy/wh exact;
    # class CE ~ 0 → total loss ~ 0
    assert float(loss) < 1e-4
    assert float(aux['recall']) > 0.999


def test_loss_warmup_branch():
    """Before warm_up_batches, empty cells regress toward anchor priors →
    non-zero coord loss even with a perfect prediction."""
    anchors = np.array([2.0, 2.0], np.float32)
    y_pred = (np.random.RandomState(3).randn(1, 3, 3, 1, 7)
              .astype(np.float32))
    y_true = np.zeros((1, 3, 3, 1, 7), np.float32)
    tboxes = np.zeros((1, 1, 1, 1, 50, 4), np.float32)
    _, aux_warm = yolo_loss(jnp.array(y_pred), jnp.array(y_true),
                            jnp.array(tboxes), jnp.array(anchors),
                            step=0, warm_up_batches=10)
    _, aux_after = yolo_loss(jnp.array(y_pred), jnp.array(y_true),
                             jnp.array(tboxes), jnp.array(anchors),
                             step=11, warm_up_batches=10)
    assert float(aux_warm['loss_xy']) > 0.0
    assert float(aux_after['loss_xy']) == 0.0


def test_loss_gradients_finite(rng):
    y_pred, y_true, tboxes = make_case(rng, b=1, nobj=2)

    def f(p):
        return yolo_loss(p, jnp.array(y_true), jnp.array(tboxes),
                         jnp.array(ANCHORS))[0]

    g = jax.grad(f)(jnp.array(y_pred))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_bce_matches_keras_formula(rng):
    p = rng.uniform(0.01, 0.99, (4, 8)).astype(np.float32)
    t = (rng.rand(4, 8) > 0.5).astype(np.float32)
    want = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
    got = float(binary_crossentropy(jnp.array(p), jnp.array(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_heatmap_accuracy():
    t = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    p = jnp.array([[1.0, 0.0, 1.0, 0.0]])
    np.testing.assert_allclose(float(heatmap_accuracy(p, t)), 0.5,
                               rtol=1e-5)
