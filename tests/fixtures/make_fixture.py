"""Generate the committed golden-detection fixture.

Why this exists: the reference's flagship artifact is a YOLOv2 loading
stock `yolov2.weights` (~200 MB, /root/reference/models_detection/
KerasYOLO.py:59) and detecting real objects. This build environment has
zero network egress and no weights file on disk (PARITY.md records the
blocker), so end-to-end "real weights → real detections" is proven with
a self-contained substitute that exercises every step of that path:

1. a real darknet `.cfg` (yolov2-micro.cfg — genuine YOLOv2 topology:
   conv/BN/leaky trunk, maxpools, route+reorg passthrough, linear 1x1
   head, [region] anchors) compiled by models/darknet_cfg.py;
2. the model TRAINED to detect (synthetic two-class scenes — the only
   image source available offline) so detections are meaningful, not
   random-weight noise;
3. the trained parameters serialized to a genuine darknet binary
   `.weights` file (modern 5-slot header, OIHW kernel order, bn order
   beta/gamma/mean/var) via export_weights_for_cfg — the committed file
   is byte-format-identical to what darknet itself writes;
4. held-out fixture images + the decoded boxes pinned to golden JSON.

tests/test_golden_detect.py then proves: committed binary → real reader
(DarknetWeightReader: header versioning, stream order) → cfg-compiled
flax model → jitted forward → on-device decode+NMS → boxes that match
both the golden JSON and the ground truth (IoU > 0.5). That is the full
M1 slice of SURVEY.md §7 minus only the 200 MB download.

Run from the repo root (writes into tests/fixtures/):
    python tests/fixtures/make_fixture.py
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

FIXTURE_DIR = os.path.dirname(os.path.abspath(__file__))

CFG_TEXT = """\
# yolov2-micro: genuine YOLOv2 topology at fixture scale (160x160 in,
# 5x5 grid, route+reorg passthrough, 5 anchors, 2 classes).
[net]
height=160
width=160
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

# passthrough source (10x10x48), like yolov2's 26x26 tap
[convolutional]
batch_normalize=1
filters=48
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
activation=leaky

[route]
layers=-3

[reorg]
stride=2

[route]
layers=12,10

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
activation=leaky

[convolutional]
filters=35
size=1
stride=1
activation=linear

[region]
anchors=0.6,0.6, 1.0,1.0, 1.4,1.4, 1.9,1.9, 2.5,2.5
bias_match=1
classes=2
num=5
"""

LABELS = ('1', '2')
NET = 160
GRID = 5
ANCHORS = (0.6, 0.6, 1.0, 1.0, 1.4, 1.4, 1.9, 1.9, 2.5, 2.5)


def _train(detector, tmp: str, *, epochs: int = 40, seed: int = 0):
    from object_tracking_tpu.config import LossConfig
    from object_tracking_tpu.data import DetectionBatches, parse_annotation_dir
    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    from object_tracking_tpu.training import (
        TrainState, make_detector_train_step, make_optimizer)

    img_dir, ann_dir = make_synthetic_dataset(
        os.path.join(tmp, 'train'), num_videos=32, frames_per_video=8,
        image_size=(NET, NET), labels=LABELS, box_frac=0.3,
        size_jitter=0.4, seed=seed)
    anns, _ = parse_annotation_dir(ann_dir, img_dir, LABELS)
    gen = DetectionBatches(
        anns, LABELS, net_h=NET, net_w=NET, grid_h=GRID, grid_w=GRID,
        anchors=ANCHORS, batch_size=16, max_boxes=8, augment=True,
        seed=seed, drop_last=True)

    # Adapt the cfg net's {'heads': [...]} output to the detector step's
    # {'netout': ...} contract (single [region] head).
    module = detector.module

    def apply_fn(variables, images, train=False, mutable=False):
        out = module.apply(variables, images, train=train,
                           mutable=mutable)
        if mutable:
            out, updates = out
            return {'netout': out['heads'][0]}, updates
        return {'netout': out['heads'][0]}

    state = TrainState.create(apply_fn, detector.variables,
                              make_optimizer(1e-3))
    step = make_detector_train_step(ANCHORS, LossConfig(object_scale=5.0))
    for epoch in range(epochs):
        metrics = None
        for batch in gen():
            state, metrics = step(state, batch)
        if epoch % 5 == 0 or epoch == epochs - 1:
            print(f'epoch {epoch}: ' + ', '.join(
                f'{k}={float(v):.4f}' for k, v in metrics.items()))
    return {'params': jax.device_get(state.params),
            'batch_stats': jax.device_get(state.batch_stats)}


def main() -> None:
    import tempfile

    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    from object_tracking_tpu.models.darknet_cfg import (
        CfgDetector, export_weights_for_cfg)

    cfg_path = os.path.join(FIXTURE_DIR, 'yolov2-micro.cfg')
    weights_path = os.path.join(FIXTURE_DIR, 'yolov2-micro.weights')
    golden_path = os.path.join(FIXTURE_DIR, 'golden_boxes.json')
    with open(cfg_path, 'w') as f:
        f.write(CFG_TEXT)

    detector = CfgDetector(CFG_TEXT, labels=LABELS, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        variables = _train(detector, tmp, epochs=150)
        export_weights_for_cfg(variables, CFG_TEXT, weights_path,
                               seen=32 * 8 * 150)

        # Reload from the binary (full ingestion path) for the golden run.
        reloaded = CfgDetector(cfg_path, weights_path=weights_path,
                               labels=LABELS)

        # Held-out fixture scenes: different seed than training.
        img_dir, ann_dir = make_synthetic_dataset(
            os.path.join(tmp, 'val'), num_videos=4, frames_per_video=1,
            image_size=(NET, NET), labels=LABELS, box_frac=0.3,
            size_jitter=0.3, seed=1234)

        golden = {'cfg': 'yolov2-micro.cfg',
                  'weights': 'yolov2-micro.weights',
                  'labels': list(LABELS), 'images': []}
        import shutil
        import xml.etree.ElementTree as ET
        for v in range(4):
            src = os.path.join(img_dir, f'video_{v:02d}', '0000.jpg')
            name = f'scene_{v}.jpg'
            shutil.copy(src, os.path.join(FIXTURE_DIR, name))
            xml = ET.parse(os.path.join(
                ann_dir, f'video_{v:02d}', '0000.xml'))
            bb = xml.find('.//bndbox')
            gt = [int(bb.find(k).text)
                  for k in ('xmin', 'ymin', 'xmax', 'ymax')]
            gt_label = xml.find('.//name').text
            dets = reloaded.detect(os.path.join(FIXTURE_DIR, name))
            print(name, 'gt', gt_label, gt, '->', dets)
            golden['images'].append({
                'file': name,
                'gt_box_xyxy': gt, 'gt_label': gt_label,
                'detections': [
                    {'label': l, 'score': round(s, 4),
                     'box_cxcywh': [round(c, 5) for c in b]}
                    for l, s, b in dets]})
        with open(golden_path, 'w') as f:
            json.dump(golden, f, indent=1)
    size = os.path.getsize(weights_path)
    print(f'wrote {weights_path} ({size / 1024:.0f} KiB), '
          f'{golden_path}, 4 scenes')


if __name__ == '__main__':
    main()
