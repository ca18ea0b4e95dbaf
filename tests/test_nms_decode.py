"""NMS + decode parity against a clean-room numpy mirror of the reference
greedy algorithm (utility/utils.py:208-257)."""

import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.ops import decode_and_nms, greedy_nms_scores
from object_tracking_tpu.ops.decode import boxes_to_list, decode_netout

from tests.test_boxes import ref_bbox_iou


def ref_greedy_nms(boxes, scores, nms_threshold):
    """Numpy mirror of the reference per-class greedy loop
    (utils.py:239-252): descending order per class; zeroed boxes suppress
    nothing; suppression zeroes the class score of lower-ranked overlaps."""
    scores = scores.copy()
    n, c = scores.shape
    for cls in range(c):
        order = list(reversed(np.argsort(scores[:, cls], kind='stable')))
        for i in range(n):
            ii = order[i]
            if scores[ii, cls] == 0:
                continue
            for j in range(i + 1, n):
                jj = order[j]
                if ref_bbox_iou(boxes[ii], boxes[jj]) >= nms_threshold:
                    scores[jj, cls] = 0
    return scores


def make_sparse_candidates(rng, n=40, c=6):
    boxes = rng.uniform(0.05, 0.9, size=(n, 4)).astype(np.float32)
    boxes[:, 2:] = rng.uniform(0.05, 0.4, size=(n, 2))
    scores = np.zeros((n, c), dtype=np.float32)
    hot = rng.rand(n, c) < 0.25
    scores[hot] = rng.uniform(0.5, 1.0, size=hot.sum()).astype(np.float32)
    return boxes, scores


def test_nms_matches_reference_greedy(rng):
    boxes, scores = make_sparse_candidates(rng)
    want = ref_greedy_nms(boxes, scores, 0.45)
    got_boxes, got_scores = greedy_nms_scores(
        jnp.array(boxes), jnp.array(scores), 0.45, top_k=0)
    np.testing.assert_allclose(np.asarray(got_boxes), boxes)
    # identical survivors (ties in score are vanishingly unlikely here)
    np.testing.assert_allclose(np.asarray(got_scores), want,
                               rtol=1e-4, atol=1e-6)


def test_nms_topk_matches_full_when_sparse(rng):
    boxes, scores = make_sparse_candidates(rng, n=60)
    live = int((scores.max(-1) > 0).sum())  # top_k >= live rows → exact
    fb, fs = greedy_nms_scores(jnp.array(boxes), jnp.array(scores),
                               0.45, top_k=0)
    tb, ts = greedy_nms_scores(jnp.array(boxes), jnp.array(scores),
                               0.45, top_k=live)
    # compare as sets of (box, survived score) for surviving entries
    def survivors(b, s):
        b, s = np.asarray(b), np.asarray(s)
        keep = s.max(-1) > 0
        rows = [tuple(np.round(np.concatenate([b[i], s[i]]), 5))
                for i in np.where(keep)[0]]
        return sorted(rows)
    assert survivors(fb, fs) == survivors(tb, ts)


def ref_decode_netout(netout, obj_threshold, anchors):
    """Numpy mirror of utils.py:208-236 decode (before NMS)."""
    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    def softmax(x):
        x = x - x.max()
        e = np.exp(x)
        return e / e.sum(-1, keepdims=True)

    netout = netout.copy()
    gh, gw, nb = netout.shape[:3]
    netout[..., 4] = sigmoid(netout[..., 4])
    for r in range(gh):
        for cl in range(gw):
            for b in range(nb):
                netout[r, cl, b, 5:] = (netout[r, cl, b, 4]
                                        * softmax(netout[r, cl, b, 5:]))
    netout[..., 5:] *= netout[..., 5:] > obj_threshold

    boxes, scores = [], []
    for r in range(gh):
        for cl in range(gw):
            for b in range(nb):
                x, y, w, h = netout[r, cl, b, :4]
                boxes.append([(cl + sigmoid(x)) / gw,
                              (r + sigmoid(y)) / gh,
                              anchors[2 * b] * np.exp(w) / gw,
                              anchors[2 * b + 1] * np.exp(h) / gh])
                scores.append(netout[r, cl, b, 5:])
    return np.array(boxes), np.array(scores)


def test_decode_matches_reference(rng):
    anchors = [0.57273, 0.677385, 1.87446, 2.06253, 3.33843,
               5.47434, 7.88282, 3.52778, 9.77052, 9.16828]
    netout = rng.randn(5, 5, 5, 5 + 4).astype(np.float32)
    want_boxes, want_scores = ref_decode_netout(netout, 0.5, anchors)
    got_boxes, got_scores = decode_netout(jnp.array(netout), anchors, 0.5)
    np.testing.assert_allclose(np.asarray(got_boxes), want_boxes,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_scores), want_scores,
                               rtol=1e-3, atol=1e-5)


def test_decode_and_nms_end_to_end(rng):
    anchors = jnp.array([1.0, 1.0, 2.0, 2.0], jnp.float32)
    # craft a netout with one very confident cell
    netout = np.full((3, 3, 2, 5 + 3), -8.0, dtype=np.float32)
    netout[1, 1, 0, :] = [0.0, 0.0, 0.0, 0.0, 8.0, 6.0, -6.0, -6.0]
    boxes, labels, scores, valid = decode_and_nms(
        jnp.array(netout), anchors, obj_threshold=0.5,
        nms_threshold=0.45, top_k=8)
    out = boxes_to_list(boxes, labels, scores, valid)
    assert len(out) == 1
    label, score, (cx, cy, w, h) = out[0]
    assert label == 0 and score > 0.9
    np.testing.assert_allclose([cx, cy], [1.5 / 3, 1.5 / 3], atol=1e-5)
    np.testing.assert_allclose([w, h], [1.0 / 3, 1.0 / 3], atol=1e-5)
