"""Golden end-to-end detection: committed darknet binary → real boxes.

This is the offline substitute for validating against stock
`yolov2.weights` (no network egress in this environment; blocker recorded
in PARITY.md). The committed fixture (tests/fixtures/, produced by
make_fixture.py) is a genuine YOLOv2-topology cfg + a TRAINED weight file
in real darknet binary format (modern 5-slot header, bn beta/gamma/mean/
var order, OIHW kernels). These tests prove the full KerasYOLO.predict
slice (/root/reference/models_detection/KerasYOLO.py:244-274 ingestion,
:522-537 predict): binary → DarknetWeightReader → cfg-compiled flax
module → jitted forward → on-device decode+NMS → boxes that match both
the pinned golden JSON and the ground truth.
"""

import json
import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), 'fixtures')
CFG = os.path.join(FIXTURES, 'yolov2-micro.cfg')
WEIGHTS = os.path.join(FIXTURES, 'yolov2-micro.weights')
GOLDEN = os.path.join(FIXTURES, 'golden_boxes.json')

pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason='fixture not generated')


@pytest.fixture(scope='module')
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope='module')
def detector(golden):
    from object_tracking_tpu.models.darknet_cfg import CfgDetector
    return CfgDetector(CFG, weights_path=WEIGHTS,
                       labels=tuple(golden['labels']))


def _iou_center(a, b):
    ax0, ay0 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax1, ay1 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx0, by0 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx1, by1 = b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / max(union, 1e-9)


def test_header_is_modern_5_slot():
    raw = np.fromfile(WEIGHTS, dtype=np.int32, count=3)
    major, minor = int(raw[0]), int(raw[1])
    assert major * 10 + minor >= 2   # stock yolov2.weights layout
    from object_tracking_tpu.ops.weights import DarknetWeightReader
    assert DarknetWeightReader(WEIGHTS)._header_floats == 5


def test_weights_exactly_consumed_by_cfg_plan():
    from object_tracking_tpu.models.darknet_cfg import load_weights_for_cfg
    loaded = load_weights_for_cfg(WEIGHTS, open(CFG).read())
    assert 'conv_0' in loaded['params']
    assert 'norm_0' in loaded['batch_stats']


def test_export_reproduces_committed_binary(tmp_path):
    """reader∘writer is the identity on the real committed file."""
    from object_tracking_tpu.models.darknet_cfg import (
        export_weights_for_cfg, load_weights_for_cfg)
    text = open(CFG).read()
    loaded = load_weights_for_cfg(WEIGHTS, text)
    out = tmp_path / 'roundtrip.weights'
    seen = int(np.fromfile(WEIGHTS, dtype=np.uint64, count=1,
                           offset=12)[0])
    export_weights_for_cfg(loaded, text, str(out), seen=seen)
    a = np.fromfile(WEIGHTS, np.uint8)
    b = np.fromfile(str(out), np.uint8)
    assert np.array_equal(a, b)


def test_detections_match_golden_and_gt(detector, golden):
    """Every fixture scene: decoded boxes match the pinned golden set
    (same label, IoU >= 0.8, score within 0.05) and overlap the GT box
    (IoU > 0.5) — i.e. the ingested weights really detect."""
    for scene in golden['images']:
        dets = detector.detect(os.path.join(FIXTURES, scene['file']))
        gold = scene['detections']
        assert len(dets) == len(gold), (scene['file'], dets, gold)
        for (label, score, box), g in zip(dets, gold):
            assert label == g['label']
            assert abs(score - g['score']) < 0.05
            assert _iou_center(box, g['box_cxcywh']) >= 0.8

        # quality, not just reproducibility: top det covers the GT
        x0, y0, x1, y1 = scene['gt_box_xyxy']
        gt = ((x0 + x1) / 2 / 160, (y0 + y1) / 2 / 160,
              (x1 - x0) / 160, (y1 - y0) / 160)
        assert dets, f'no detections on {scene["file"]}'
        label, score, box = dets[0]
        assert label == scene['gt_label']
        assert _iou_center(box, gt) > 0.5


def test_detect_cli_draws_boxes(tmp_path, golden):
    """`python -m object_tracking_tpu.trainer detect --cfg ... --weights
    ... --image scene.jpg` — the KerasYOLO.predict CLI slice."""
    from object_tracking_tpu.trainer import main
    img = os.path.join(FIXTURES, golden['images'][0]['file'])
    rc = main(['detect', '--cfg', CFG, '--weights', WEIGHTS,
               '--image', img, '--out-dir', str(tmp_path)])
    assert rc == 0
    out = tmp_path / (os.path.basename(img).rsplit('.', 1)[0] + '_out.jpg')
    assert out.exists() and out.stat().st_size > 0
