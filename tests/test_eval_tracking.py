"""Tests for ID matching, CLEAR-MOT evaluation, and the joint predictor."""

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.evaluation import (
    average_overlap_score, evaluate_mot, overlap_score, success_auc,
    success_curve)
from object_tracking_tpu.ops.matching import (
    TrackManager, greedy_match, hungarian_match)


# ---------------------------------------------------------------- match
def test_greedy_match_basic():
    a = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]])
    b = jnp.asarray([[0.52, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]])
    ok = jnp.ones((2,), bool)
    m = greedy_match(a, ok, b, ok, iou_threshold=0.3)
    assert m.tolist() == [0, -1]


def test_greedy_match_one_to_one():
    # Two b-boxes overlap the same a-box; only the better one matches.
    a = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    b = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.52, 0.5, 0.2, 0.2]])
    m = greedy_match(a, jnp.ones((1,), bool), b, jnp.ones((2,), bool),
                     iou_threshold=0.3)
    assert m.tolist() == [0, -1]


def test_greedy_match_respects_validity():
    a = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    b = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    m = greedy_match(a, jnp.zeros((1,), bool), b, jnp.ones((1,), bool))
    assert m.tolist() == [-1]


def test_hungarian_beats_greedy_on_crossing():
    # Greedy would pair (a0,b0) leaving a1 unmatched; optimal is
    # (a0,b1),(a1,b0).
    a = np.asarray([[0.50, 0.5, 0.20, 0.2], [0.60, 0.5, 0.20, 0.2]],
                   np.float32)
    b = np.asarray([[0.55, 0.5, 0.20, 0.2], [0.48, 0.5, 0.20, 0.2]],
                   np.float32)
    pairs = dict(hungarian_match(a, b, iou_threshold=0.1))
    assert len(pairs) == 2


def test_track_manager_identity_persistence():
    tm = TrackManager(iou_threshold=0.3, max_age=1)
    ids1 = tm.update(np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32))
    ids2 = tm.update(np.asarray([[0.52, 0.5, 0.2, 0.2]], np.float32))
    assert ids1 == ids2 == [0]
    # A far-away box gets a new id.
    ids3 = tm.update(np.asarray([[0.9, 0.9, 0.1, 0.1]], np.float32))
    assert ids3 == [1]
    # After max_age misses, id 0 is retired → reappearing box is new.
    tm.update(np.zeros((0, 4), np.float32))
    ids4 = tm.update(np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32))
    assert ids4 == [2]


def test_track_manager_label_aware():
    # Same spot, different class → must NOT continue the track.
    tm = TrackManager(iou_threshold=0.3, max_age=5)
    box = np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32)
    ids1 = tm.update(box, labels=np.asarray([0]))
    ids2 = tm.update(box, labels=np.asarray([1]))
    assert ids1 == [0] and ids2 == [1]
    # Same class again → continues the original track.
    ids3 = tm.update(box, labels=np.asarray([0]))
    assert ids3 == [0]


def test_hungarian_match_label_mask():
    a = np.asarray([[0.5, 0.5, 0.2, 0.2], [0.52, 0.5, 0.2, 0.2]],
                   np.float32)
    b = np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32)
    # Without labels the perfectly-overlapping pair (0,0) wins.
    assert dict(hungarian_match(a, b, 0.3)) == {0: 0}
    # With labels, only the class-1 track may match.
    pairs = hungarian_match(a, b, 0.3,
                            labels_a=np.asarray([0, 1]),
                            labels_b=np.asarray([1]))
    assert dict(pairs) == {1: 0}


# ----------------------------------------------------------------- eval
def test_overlap_score_matches_hand_computed():
    assert overlap_score([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert overlap_score([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
    # half-overlap: inter 50, union 150
    np.testing.assert_allclose(
        overlap_score([0, 0, 10, 10], [5, 0, 15, 10]), 50 / 150)


def test_average_overlap_and_success():
    preds = [[0, 0, 10, 10], [0, 0, 10, 10]]
    gts = [[0, 0, 10, 10], [5, 0, 15, 10]]
    avg = average_overlap_score(preds, gts)
    np.testing.assert_allclose(avg, (1.0 + 50 / 150) / 2)
    th, rates = success_curve(preds, gts)
    assert rates[0] == 1.0 and rates[-1] == 0.0
    assert 0.0 < success_auc(preds, gts) < 1.0


def test_evaluate_mot_perfect():
    frames = [{1: np.array([0, 0, 10, 10]), 2: np.array([20, 20, 30, 30])}
              for _ in range(5)]
    m = evaluate_mot(frames, frames)
    assert m['mota'] == 1.0
    assert m['motp'] == 1.0
    assert m['fp'] == m['fn'] == m['id_switches'] == 0


def test_evaluate_mot_counts_errors():
    gt = [{1: np.array([0, 0, 10, 10])} for _ in range(4)]
    # pred: missing frame 0 (FN), extra box frame 1 (FP), id switch at 2.
    pred = [
        {},
        {7: np.array([0, 0, 10, 10]), 8: np.array([50, 50, 60, 60])},
        {9: np.array([0, 0, 10, 10])},
        {9: np.array([0, 0, 10, 10])},
    ]
    m = evaluate_mot(gt, pred)
    assert m['fn'] == 1 and m['fp'] == 1 and m['id_switches'] == 1
    np.testing.assert_allclose(m['mota'], 1.0 - 3 / 4)


def test_evaluate_mot_empty_gt():
    m = evaluate_mot([{}], [{1: np.array([0, 0, 5, 5])}])
    assert m['fp'] == 1 and m['num_gt'] == 0


# ------------------------------------------------------------ predictor
def test_joint_predictor_window(rng):
    from object_tracking_tpu.inference import JointPredictor
    from object_tracking_tpu.models import MultiObjDetTracker

    t, size, c = 2, 64, 2
    model = MultiObjDetTracker(num_classes=c, num_anchors=2,
                               convlstm_features=8, width_div=8)
    frames = jnp.asarray(rng.rand(t, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames[None])
    pred = JointPredictor(
        model, variables, anchors=[1.0, 1.0, 2.0, 2.0],
        labels=['a', 'b'], obj_threshold=0.0, net_size=(size, size))
    out = pred.predict_window(np.asarray(frames))
    assert len(out) == t
    for dets in out:
        for d in dets:
            assert set(d) == {'label', 'score', 'box', 'track_id'}


# ---------------------------------------------------------------------------
# Device-side (jittable) track assignment: ops/matching.assign_tracks
# ---------------------------------------------------------------------------
class TestAssignTracks:

    def _step(self, ts, rows, iou=0.5, max_age=3, size=8):
        """rows: [(cx, cy, w, h, label)] → padded fixed-shape frame."""
        import jax.numpy as jnp

        from object_tracking_tpu.ops.matching import assign_tracks
        boxes = np.zeros((size, 4), np.float32)
        labels = np.zeros((size,), np.int32)
        valid = np.zeros((size,), bool)
        for i, (cx, cy, w, h, l) in enumerate(rows):
            boxes[i] = (cx, cy, w, h)
            labels[i] = l
            valid[i] = True
        ts, ids = assign_tracks(ts, jnp.asarray(boxes),
                                jnp.asarray(labels), jnp.asarray(valid),
                                iou_threshold=iou, max_age=max_age)
        return ts, np.asarray(ids)[:len(rows)]

    def test_identity_continuity_and_new_ids(self):
        from object_tracking_tpu.ops.matching import init_track_state
        ts = init_track_state(8)
        ts, ids1 = self._step(ts, [(0.2, 0.2, 0.1, 0.1, 0),
                                   (0.7, 0.7, 0.1, 0.1, 1)])
        assert sorted(ids1) == [0, 1]
        # slight motion keeps identities; a third object gets a new id
        ts, ids2 = self._step(ts, [(0.22, 0.21, 0.1, 0.1, 0),
                                   (0.71, 0.7, 0.1, 0.1, 1),
                                   (0.5, 0.1, 0.1, 0.1, 0)])
        assert ids2[0] == ids1[0]
        assert ids2[1] == ids1[1]
        assert ids2[2] == 2

    def test_class_aware(self):
        from object_tracking_tpu.ops.matching import init_track_state
        ts = init_track_state(8)
        ts, ids1 = self._step(ts, [(0.5, 0.5, 0.2, 0.2, 0)])
        # same box, different class: must NOT continue track 0
        ts, ids2 = self._step(ts, [(0.5, 0.5, 0.2, 0.2, 1)])
        assert ids2[0] != ids1[0]

    def test_retirement_after_max_age(self):
        from object_tracking_tpu.ops.matching import init_track_state
        ts = init_track_state(8)
        ts, ids1 = self._step(ts, [(0.5, 0.5, 0.2, 0.2, 0)], max_age=1)
        for _ in range(3):                       # unseen > max_age
            ts, _ = self._step(ts, [], max_age=1)
        ts, ids2 = self._step(ts, [(0.5, 0.5, 0.2, 0.2, 0)], max_age=1)
        assert ids2[0] != ids1[0]                # retired, fresh id

    def test_table_full_gives_minus_one(self):
        from object_tracking_tpu.ops.matching import init_track_state
        ts = init_track_state(2)
        rows = [(0.1 + 0.2 * i, 0.5, 0.05, 0.05, 0) for i in range(4)]
        ts, ids = self._step(ts, rows, size=4)
        assert (ids >= 0).sum() == 2
        assert (ids == -1).sum() == 2

    def test_matches_host_track_manager_when_separated(self):
        """On well-separated boxes greedy == Hungarian == TrackManager."""
        from object_tracking_tpu.ops.matching import (
            TrackManager, init_track_state)
        rng = np.random.RandomState(0)
        centers = np.array([[0.2, 0.2], [0.8, 0.2], [0.5, 0.8]])
        tm = TrackManager(iou_threshold=0.5)
        ts = init_track_state(8)
        id_map = {}
        for _ in range(5):
            centers = np.clip(
                centers + rng.uniform(-0.02, 0.02, centers.shape), 0, 1)
            rows = [(c[0], c[1], 0.15, 0.15, i)
                    for i, c in enumerate(centers)]
            ts, dev_ids = self._step(ts, rows)
            host_ids = tm.update(
                np.array([r[:4] for r in rows], np.float32),
                labels=np.array([r[4] for r in rows]))
            for d, h in zip(dev_ids, host_ids):
                id_map.setdefault(int(d), int(h))
                assert id_map[int(d)] == int(h)


# ---------------------------------------------------------------------------
# Constant-velocity motion model (SORT-style): id persistence through
# occlusion gaps and crossings that static-IoU matching cannot survive
# ---------------------------------------------------------------------------
class TestMotionModel(TestAssignTracks):

    def test_reacquire_after_occlusion_gap(self):
        """Object moving 0.03/frame (matchable through the 0.3 gate)
        hidden for 3 frames: the reappearance point is ~1.2 box-widths
        past the last seen box (static IoU ≈ 0 — below any gate); the
        coasting track follows the motion and keeps the id."""
        from object_tracking_tpu.ops.matching import init_track_state
        ts = init_track_state(8)
        tid = None
        # establish the track + its velocity over 3 visible frames
        for k in range(3):
            ts, ids = self._step(ts, [(0.1 + 0.03 * k, 0.5, 0.1, 0.1, 0)],
                                 iou=0.3)
            tid = ids[0]
        for _ in range(3):                       # occluded 3 frames
            ts, _ = self._step(ts, [], iou=0.3)
        # static-box IoU at reappearance: centers 0.12 apart, box 0.1
        # wide -> no overlap at all
        ts, ids = self._step(ts, [(0.1 + 0.03 * 6, 0.5, 0.1, 0.1, 0)],
                             iou=0.3)
        assert ids[0] == tid, 'id lost across the occlusion gap'

    def test_crossing_objects_keep_ids(self):
        """Two same-class objects pass through each other; velocity-
        predicted matching keeps each id on its own trajectory."""
        from object_tracking_tpu.ops.matching import init_track_state
        ts = init_track_state(8)
        # left->right and right->left along y=0.5, meeting at x=0.5
        xs_a = np.linspace(0.3, 0.7, 17)
        xs_b = xs_a[::-1]
        first = None
        for k, (xa, xb) in enumerate(zip(xs_a, xs_b)):
            ts, ids = self._step(
                ts, [(xa, 0.5, 0.08, 0.08, 0), (xb, 0.5, 0.08, 0.08, 0)],
                iou=0.3)
            if first is None:
                first = list(ids)
            assert list(ids) == first, f'id swap at step {k}: {ids}'

    def test_host_manager_reacquires_after_gap(self):
        from object_tracking_tpu.ops.matching import TrackManager
        tm = TrackManager(iou_threshold=0.3, max_age=3)
        tid = None
        for k in range(3):
            out = tm.update(np.array([[0.1 + 0.03 * k, 0.5, 0.1, 0.1]],
                                     np.float32), labels=np.array([0]))
            tid = out[0]
        for _ in range(3):
            tm.update(np.zeros((0, 4), np.float32),
                      labels=np.zeros((0,), np.int64))
        out = tm.update(np.array([[0.1 + 0.03 * 6, 0.5, 0.1, 0.1]],
                                 np.float32), labels=np.array([0]))
        assert out[0] == tid


def test_joint_predictor_batch_matches_independent_streams(rng):
    """predict_batch's B independent streams must reproduce per-clip
    predict_window runs exactly (bn_mode='running' keeps BatchNorm from
    coupling the streams), including carried state across windows."""
    from object_tracking_tpu.inference import JointPredictor
    from object_tracking_tpu.models import MultiObjDetTracker

    b, t, size, c = 2, 2, 64, 2
    model = MultiObjDetTracker(num_classes=c, num_anchors=2,
                               convlstm_features=8, width_div=8)
    clips = rng.rand(b, 2 * t, size, size, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(clips[:1, :t]))

    def make():
        return JointPredictor(
            model, variables, anchors=[1.0, 1.0, 2.0, 2.0],
            labels=['a', 'b'], obj_threshold=0.0, net_size=(size, size),
            bn_mode='running')

    batched = make()
    got = [batched.predict_batch(clips[:, :t]),
           batched.predict_batch(clips[:, t:])]   # streaming continuation
    for i in range(b):
        solo = make()
        want = [solo.predict_window(clips[i, :t]),
                solo.predict_window(clips[i, t:])]
        for w_call, g_call in zip(want, got):
            for w_frame, g_frame in zip(w_call, g_call[i]):
                assert len(w_frame) == len(g_frame)
                for wd, gd in zip(w_frame, g_frame):
                    assert wd['label'] == gd['label']
                    assert wd['track_id'] == gd['track_id']
                    np.testing.assert_allclose(wd['box'], gd['box'],
                                               rtol=1e-5, atol=1e-5)
                    np.testing.assert_allclose(wd['score'], gd['score'],
                                               rtol=1e-5, atol=1e-5)


def test_joint_predictor_batch_resets_on_size_change(rng):
    from object_tracking_tpu.inference import JointPredictor
    from object_tracking_tpu.models import MultiObjDetTracker

    t, size, c = 2, 64, 2
    model = MultiObjDetTracker(num_classes=c, num_anchors=2,
                               convlstm_features=8, width_div=8)
    clips3 = rng.rand(3, t, size, size, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(clips3[:1]))
    pred = JointPredictor(
        model, variables, anchors=[1.0, 1.0, 2.0, 2.0],
        labels=['a', 'b'], obj_threshold=0.0, net_size=(size, size),
        bn_mode='running')
    assert len(pred.predict_batch(clips3)) == 3
    assert len(pred.predict_batch(clips3[:2])) == 2   # resets, no crash
