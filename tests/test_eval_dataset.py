"""Dataset-level CLEAR-MOT harness: perfect predictor → MOTA 1.0;
noisy/missing predictions degrade it sanely. Uses a stub predictor so the
harness is tested independently of model quality."""

import numpy as np

from object_tracking_tpu.data.voc import Annotation, ObjectAnnotation
from object_tracking_tpu.evaluation import evaluate_tracking_dataset


def _make_annotations(n_frames=8, n_videos=2):
    anns = []
    for v in range(n_videos):
        for f in range(n_frames):
            objs = [
                ObjectAnnotation('a', 10 + f, 20, 30 + f, 60,
                                 trackid=1),
                ObjectAnnotation('a', 50, 50 + f, 90, 90 + f,
                                 trackid=2),
            ]
            anns.append(Annotation(
                filename=f'/v{v}/{f:04d}.jpg', folder=f'v{v}',
                width=100, height=100, objects=objs))
    return anns


class PerfectPredictor:
    """Echoes ground truth as predictions with stable track ids."""

    labels = ('a',)

    def __init__(self, annotations):
        self.by_path = {a.filename: a for a in annotations}

    def predict_video(self, paths, window=4):
        out = []
        for p in paths:
            ann = self.by_path[p]
            dets = []
            for obj in ann.objects:
                cx = (obj.xmin + obj.xmax) / 2 / ann.width
                cy = (obj.ymin + obj.ymax) / 2 / ann.height
                w = (obj.xmax - obj.xmin) / ann.width
                h = (obj.ymax - obj.ymin) / ann.height
                dets.append({'label': obj.label, 'score': 0.9,
                             'box': (cx, cy, w, h),
                             'track_id': obj.trackid})
            out.append(dets)
        return out


class EmptyPredictor:
    def predict_video(self, paths, window=4):
        return [[] for _ in paths]


def test_perfect_predictions_give_mota_one():
    anns = _make_annotations()
    res = evaluate_tracking_dataset(PerfectPredictor(anns), anns,
                                    window=4)
    assert set(res) == {'v0', 'v1', 'detection', 'overall'}
    assert res['overall']['mota'] == 1.0
    assert res['overall']['motp'] > 0.99
    assert res['overall']['fp'] == 0
    assert res['overall']['fn'] == 0
    assert res['overall']['id_switches'] == 0
    # Perfect echo → detection mAP 1.0 too.
    assert res['overall']['map'] == 1.0
    assert res['detection']['map'] == 1.0


def test_empty_predictions_give_zero_mota():
    anns = _make_annotations()
    res = evaluate_tracking_dataset(EmptyPredictor(), anns, window=4)
    assert res['overall']['mota'] == 0.0          # all FN, no FP
    assert res['overall']['fn'] == res['overall']['num_gt']


def test_partial_window_frames_covered():
    """No silent tail truncation: predict_video pads its final partial
    window, so all 7 frames (not just 4) are evaluated."""
    anns = _make_annotations(n_frames=7, n_videos=1)
    res = evaluate_tracking_dataset(PerfectPredictor(anns), anns,
                                    window=4)
    assert res['overall']['num_gt'] == 2 * 7
    assert res['overall']['mota'] == 1.0


# ------------------------------------------------------------- detection mAP
def test_average_precision_hand_computed():
    from object_tracking_tpu.evaluation import average_precision
    # ranks: TP, FP, TP over 2 GT → recall [.5,.5,1], prec [1,.5,2/3]
    recall = np.asarray([0.5, 0.5, 1.0])
    precision = np.asarray([1.0, 0.5, 2.0 / 3.0])
    np.testing.assert_allclose(average_precision(recall, precision),
                               0.5 * 1.0 + 0.5 * (2.0 / 3.0))


def test_evaluate_detection_perfect():
    from object_tracking_tpu.evaluation import evaluate_detection
    gt = [{'boxes': np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]],
                               np.float32),
           'labels': np.asarray([0, 1])}]
    pred = [{'boxes': gt[0]['boxes'], 'scores': np.asarray([0.9, 0.8]),
             'labels': np.asarray([0, 1])}]
    out = evaluate_detection(gt, pred)
    assert out['map'] == 1.0
    assert out['ap_per_class'] == {0: 1.0, 1: 1.0}


def test_evaluate_detection_hand_computed():
    from object_tracking_tpu.evaluation import evaluate_detection
    gt = [{'boxes': np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]],
                               np.float32),
           'labels': np.asarray([0, 0])}]
    # d1 (0.9) hits gt1, d2 (0.8) misses, d3 (0.7) hits gt2.
    pred = [{'boxes': np.asarray([[0, 0, 10, 10], [60, 60, 70, 70],
                                  [21, 20, 40, 40]], np.float32),
             'scores': np.asarray([0.9, 0.8, 0.7]),
             'labels': np.asarray([0, 0, 0])}]
    out = evaluate_detection(gt, pred)
    np.testing.assert_allclose(out['map'],
                               0.5 * 1.0 + 0.5 * (2.0 / 3.0))


def test_evaluate_detection_wrong_class_is_fp():
    from object_tracking_tpu.evaluation import evaluate_detection
    gt = [{'boxes': np.asarray([[0, 0, 10, 10]], np.float32),
           'labels': np.asarray([0])}]
    pred = [{'boxes': gt[0]['boxes'], 'scores': np.asarray([0.9]),
             'labels': np.asarray([1])}]
    out = evaluate_detection(gt, pred)
    # class 0: no detections → AP 0; class 1: FP only → AP 0.
    assert out['map'] == 0.0


def test_evaluate_detection_duplicate_counts_once():
    from object_tracking_tpu.evaluation import evaluate_detection
    gt = [{'boxes': np.asarray([[0, 0, 10, 10]], np.float32),
           'labels': np.asarray([0])}]
    pred = [{'boxes': np.asarray([[0, 0, 10, 10], [0, 0, 10, 10]],
                                 np.float32),
             'scores': np.asarray([0.9, 0.8]),
             'labels': np.asarray([0, 0])}]
    out = evaluate_detection(gt, pred)
    # second hit on a used GT is an FP → AP = 1.0 (envelope at r=1).
    np.testing.assert_allclose(out['ap_per_class'][0], 1.0)
