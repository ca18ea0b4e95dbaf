"""End-to-end trainer flows on synthetic data (hermetic CLI layer test).

The reference's trainer has no tests and is driven by editing __main__
(/root/reference/trainer.py:39-40); here every flow runs end-to-end on
fabricated data: parse → window → generate → jit step → fit loop with
the full callback stack. Tiny shapes keep the single-core CPU suite
tractable.
"""

import json
import os

import numpy as np
import pytest

from object_tracking_tpu.config import Config


@pytest.fixture(autouse=True)
def small_synthetic(monkeypatch):
    """Shrink the synthetic dataset: full Darknet-19 steps on the 1-core
    CPU suite cost seconds each, so keep epochs to a couple of steps."""
    import object_tracking_tpu.trainer as trainer
    orig = trainer._synthetic_dirs
    monkeypatch.setattr(
        trainer, '_synthetic_dirs',
        lambda cfg, image_size, labels, frames=5, videos=1:
            orig(cfg, image_size, labels, frames=frames, videos=videos))


@pytest.fixture
def tiny_cfg():
    cfg = Config()
    cfg.detector.image_h = cfg.detector.image_w = 64
    cfg.detector.grid_h = cfg.detector.grid_w = 2
    cfg.detector.batch_size = 4
    # width-divided backbone: same topology/taps at 1/64 the params —
    # flow tests check mechanism, not capacity (1-core CI host)
    cfg.detector.width_div = 8
    cfg.joint.convlstm_features = 8
    cfg.joint.sequence_length = 3
    cfg.tracker.sequence_length = 3
    cfg.tracker.lstm_units = 16
    cfg.tracker.heatmap_size = 8
    cfg.train.batch_size = 2
    cfg.train.max_epochs = 1
    cfg.train.augment = False
    return cfg


def test_single_object_tracking_flow(tiny_cfg, tmp_path):
    from object_tracking_tpu.trainer import single_object_tracking
    state = single_object_tracking(tiny_cfg, synthetic=True, epochs=1,
                                   workdir=str(tmp_path))
    assert int(state.step) > 0
    assert os.path.isdir(tmp_path / 'models' / 'tiny_tracker')


def test_single_object_heatmap_flow(tiny_cfg, tmp_path):
    from object_tracking_tpu.trainer import single_object_tracking
    tiny_cfg.tracker.name = 'TinyHeatmapTracker'
    state = single_object_tracking(tiny_cfg, synthetic=True, epochs=1,
                                   workdir=str(tmp_path))
    assert int(state.step) > 0


@pytest.mark.slow     # ~13 min of joint-model compiles on the 1-core
#                        host; the fast tier covers the joint flow via
#                        test_cli_main_joint, resume via this slow guard
def test_joint_flow_and_resume(tiny_cfg, tmp_path):
    from object_tracking_tpu.trainer import (
        simult_multi_obj_detection_tracking)
    state = simult_multi_obj_detection_tracking(
        tiny_cfg, synthetic=True, epochs=1, workdir=str(tmp_path),
        image_size=64)
    first = int(state.step)
    assert first > 0
    # Resume from the checkpoint the first run wrote.
    tiny_cfg.train.resume = True
    state = simult_multi_obj_detection_tracking(
        tiny_cfg, synthetic=True, epochs=2, workdir=str(tmp_path),
        image_size=64)
    assert int(state.step) > first


def test_detector_train_flow(tiny_cfg, tmp_path):
    from object_tracking_tpu.trainer import keras_yolo_obj_detection
    state = keras_yolo_obj_detection(tiny_cfg, synthetic=True, epochs=1,
                                     workdir=str(tmp_path), train=True)
    assert int(state.step) > 0


def test_detector_predict_flow(tiny_cfg, tmp_path):
    """predict over an image file: the reference's 5-stock-jpg check
    (trainer.py:26-30), on one synthetic frame."""
    import cv2

    from object_tracking_tpu.trainer import keras_yolo_obj_detection
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype('uint8')
    path = str(tmp_path / 'frame.jpg')
    cv2.imwrite(path, img)
    results = keras_yolo_obj_detection(
        tiny_cfg, images=[path], out_dir=str(tmp_path))
    assert path in results
    assert os.path.exists(tmp_path / 'frame_out.jpg')


def test_eval_flow(tiny_cfg, capsys):
    from object_tracking_tpu.trainer import evaluate_tracking
    results = evaluate_tracking(tiny_cfg, synthetic=True, window=3)
    out = capsys.readouterr().out
    parsed = json.loads(out[out.index('{'):])
    assert results and parsed
    # Per-sequence CLEAR-MOT dicts (the result also carries a detection
    # mAP entry, which has no 'mota').
    motas = [seq for seq in results.values() if 'mota' in seq]
    assert motas


def test_cli_main_joint(tiny_cfg, tmp_path, monkeypatch):
    """argparse surface: the reference selects flows by editing __main__
    (trainer.py:39-40); here the subcommand drives the same flow."""
    import object_tracking_tpu.trainer as trainer
    monkeypatch.chdir(tmp_path)
    cfg_path = tmp_path / 'cfg.json'
    calls = {}

    def fake_joint(cfg, *, synthetic, epochs, image_size,
                   profile_dir=None):
        calls['synthetic'] = synthetic
        calls['epochs'] = epochs
        calls['image_size'] = image_size
        calls['profile_dir'] = profile_dir

    monkeypatch.setattr(trainer, 'simult_multi_obj_detection_tracking',
                        fake_joint)
    assert trainer.main(['joint', '--synthetic', '--epochs', '1',
                         '--image-size', '64']) == 0
    assert calls == {'synthetic': True, 'epochs': 1, 'image_size': 64,
                     'profile_dir': None}
    assert not cfg_path.exists()


def test_track_cli_flow(tiny_cfg, tmp_path):
    """`track` subcommand: frames dir in → drawn frames + persistent
    track ids out (the reference's predict has no CLI and crashes as
    shipped, MultiObjDetTracker.py:295-315)."""
    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    from object_tracking_tpu.trainer import track_video

    tiny_cfg.joint.labels = ('1',)
    img_dir, _ = make_synthetic_dataset(
        str(tmp_path / 'clip'), num_videos=1, frames_per_video=5,
        image_size=(64, 64), labels=('1',))
    frames = os.path.join(img_dir, 'video_00')
    out = str(tmp_path / 'drawn')
    vid = str(tmp_path / 'tracked.avi')
    results = track_video(tiny_cfg, frames_dir=frames, out_dir=out,
                          out_video=vid, fps=5.0)
    assert len(results) == 5                     # every frame covered
    assert len(os.listdir(out)) == 5
    # --out-video assembles the drawn frames into one playable file
    import cv2
    cap = cv2.VideoCapture(vid)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    cap.release()


def test_track_cli_video_file(tiny_cfg, tmp_path):
    """track accepts a VIDEO FILE: cv2-decoded to frames, then tracked."""
    import cv2
    import numpy as np

    tiny_cfg.joint.labels = ('1',)
    path = str(tmp_path / 'clip.avi')
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'MJPG'), 5,
                         (64, 64))
    assert wr.isOpened()
    rng = np.random.RandomState(0)
    for i in range(4):
        frame = rng.randint(0, 80, (64, 64, 3), np.uint8)
        frame[20:36, 10 + 4 * i:26 + 4 * i] = (0, 200, 255)
        wr.write(frame)
    wr.release()
    out = str(tmp_path / 'drawn')
    from object_tracking_tpu.trainer import track_video
    results = track_video(tiny_cfg, frames_dir=path, out_dir=out)
    assert len(results) == 4
    assert len(os.listdir(out)) == 4


def test_detector_train_flow_yolo_cfg(tiny_cfg, tmp_path):
    """`detect --train` on a multi-head [yolo] (v3-family) cfg: the
    round-3 NotImplementedError boundary, now wired end-to-end through
    the trainer (multi-scale targets + summed per-head loss)."""
    from tests.test_darknet_cfg import V3_CFG

    from object_tracking_tpu.trainer import keras_yolo_obj_detection
    cfg_path = tmp_path / 'v3.cfg'
    cfg_path.write_text(V3_CFG)
    tiny_cfg.detector.cfg_path = str(cfg_path)
    state = keras_yolo_obj_detection(tiny_cfg, synthetic=True, epochs=1,
                                     workdir=str(tmp_path), train=True)
    assert int(state.step) > 0
