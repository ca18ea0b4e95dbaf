"""Quickstart: every reference workflow, end-to-end, on synthetic data.

The reference is driven by editing `trainer.py`'s `__main__` and has no
runnable demo (no datasets ship with it). This script runs all four
flows hermetically — fabricated VOC-style video data, tiny model sizes —
so a new user sees the full surface in one command:

    python examples/quickstart.py            # CPU or TPU, ~minutes on TPU

Flows (reference parity: /root/reference/trainer.py:8-30):
  1. single_object_tracking      — TinyTracker over frozen detector priors
  2. single (heatmap)            — TinyHeatmapTracker variant
  3. simult_multi_obj_detection_tracking — joint YOLOv2+ConvLSTM training
  4. keras_yolo_obj_detection    — standalone detector train + predict
  5. evaluate_tracking           — CLEAR-MOT metrics over the val split
  6. track_video                 — tracked-video inference with drawn IDs
  7. golden detect               — committed darknet .weights fixture →
                                   real detections through the cfg compiler

For real data, point `Config.train.*_folder` at PASCAL-VOC XML dirs (use
`data/converters.py` for MOT17/VisualTB) and raise the model sizes back
to the defaults (`Config()` reproduces the reference's constants).
"""

import tempfile

from object_tracking_tpu.config import Config
from object_tracking_tpu.trainer import (
    evaluate_tracking, keras_yolo_obj_detection, single_object_tracking,
    simult_multi_obj_detection_tracking)


def tiny_config() -> Config:
    cfg = Config()
    cfg.detector.image_h = cfg.detector.image_w = 64
    cfg.detector.grid_h = cfg.detector.grid_w = 2
    cfg.joint.convlstm_features = 16
    cfg.joint.sequence_length = 3
    cfg.tracker.sequence_length = 3
    cfg.tracker.lstm_units = 32
    cfg.train.batch_size = 2
    cfg.train.augment = False
    return cfg


def main() -> None:
    work = tempfile.mkdtemp(prefix='ott_quickstart_')
    print(f'== workdir {work}')

    print('== 1/8 single-object tracking (TinyTracker)')
    single_object_tracking(tiny_config(), synthetic=True, epochs=1,
                           workdir=work)

    print('== 2/8 single-object tracking (heatmap head)')
    cfg = tiny_config()
    cfg.tracker.name = 'TinyHeatmapTracker'
    cfg.tracker.heatmap_size = 8
    single_object_tracking(cfg, synthetic=True, epochs=1, workdir=work)

    print('== 3/8 joint multi-object detection + tracking')
    simult_multi_obj_detection_tracking(tiny_config(), synthetic=True,
                                        epochs=1, workdir=work,
                                        image_size=64)

    print('== 4/8 standalone detector training')
    keras_yolo_obj_detection(tiny_config(), synthetic=True, epochs=1,
                             workdir=work, train=True)

    print('== 5/8 tracking evaluation (CLEAR-MOT)')
    evaluate_tracking(tiny_config(), synthetic=True, window=3)

    print('== 6/8 tracked-video inference (drawn boxes + persistent ids)')
    import os

    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    from object_tracking_tpu.trainer import track_video
    cfg = tiny_config()
    cfg.joint.labels = ('1',)
    img_dir, _ = make_synthetic_dataset(
        os.path.join(work, 'clip'), num_videos=1, frames_per_video=6,
        image_size=(64, 64), labels=('1',))
    track_video(cfg, frames_dir=os.path.join(img_dir, 'video_00'),
                out_dir=os.path.join(work, 'tracked'))

    print('== 7/8 golden fixture: darknet binary -> real detections')
    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'fixtures')
    if os.path.exists(os.path.join(fixtures, 'yolov2-micro.weights')):
        from object_tracking_tpu.models.darknet_cfg import CfgDetector
        det = CfgDetector(os.path.join(fixtures, 'yolov2-micro.cfg'),
                          weights_path=os.path.join(
                              fixtures, 'yolov2-micro.weights'),
                          labels=('1', '2'))
        for scene in ('scene_0.jpg', 'scene_1.jpg'):
            print(' ', scene,
                  det.detect(os.path.join(fixtures, scene)))

    print('== 8/8 AOT serving: export one artifact, serve without '
          'model code')
    import numpy as np

    from object_tracking_tpu.serving import ServedJointPredictor
    from object_tracking_tpu.trainer import export_serving
    cfg = tiny_config()
    cfg.joint.labels = ('1', '2')
    art_path = export_serving(
        cfg, out_path=os.path.join(work, 'joint.ottserve'),
        # export for the platform we're on (default is tpu+cpu)
        platforms=(__import__('jax').devices()[0].platform,))
    served = ServedJointPredictor.load(art_path)
    frames = np.random.RandomState(0).randint(
        0, 256, (1, cfg.joint.sequence_length, 64, 64, 3), np.uint8)
    out = served.predict_window(frames)
    print('  served', len(out[0]), 'frames from the artifact')

    print('== all flows complete')


if __name__ == '__main__':
    main()
