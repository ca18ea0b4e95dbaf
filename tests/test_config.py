"""Config tree: new-layout round trip + the reference's legacy
config.json layout (/root/reference/config.json)."""

import json

from object_tracking_tpu.config import Config, load_config

LEGACY = {
    "model_detector": {
        "name": "YOLO",
        "config_file": "cfg/yolov2.cfg",
        "weights_file": "yolov2.weights",
        "fv_layer": 25,
        "nms": 0.4,
        "thresh": 0.6,
    },
    "model_tracker": {
        "name": "TinyHeatmapTracker",
        "lstm_units": 256,
        "sequence_length": 8,
        "heatmap_size": 16,
    },
    "train": {
        "train_image_folder": "data/VisualTB/",
        "train_annot_folder": "data/VisualTB-voc/train",
        "batch_size": 7,
        "max_epochs": 42,
        "pool": "Max",
        "classes": ["person", "car"],
        "debug": True,
        "tensorboard_dir": "logs_x",
        "saved_model_dir": "models_x",
    },
    "val": {
        "val_image_folder": "data/VisualTB/",
        "val_annot_folder": "data/VisualTB-voc/val",
    },
}


def test_legacy_layout_maps_every_consumed_field(tmp_path):
    p = tmp_path / 'config.json'
    p.write_text(json.dumps(LEGACY))
    cfg = load_config(str(p))
    assert cfg.detector.backend == 'yolo'
    assert cfg.detector.cfg_path == 'cfg/yolov2.cfg'
    assert cfg.detector.weights_path == 'yolov2.weights'
    assert cfg.detector.nms_threshold == 0.4
    assert cfg.detector.obj_threshold == 0.6
    assert cfg.tracker.name == 'TinyHeatmapTracker'
    assert cfg.tracker.lstm_units == 256
    assert cfg.tracker.sequence_length == 8
    assert cfg.tracker.heatmap_size == 16
    assert cfg.tracker.pool == 'Max'
    assert cfg.train.batch_size == 7
    assert cfg.train.max_epochs == 42
    assert cfg.train.classes == ('person', 'car')
    assert cfg.train.debug is True
    assert cfg.train.tensorboard_dir == 'logs_x'
    assert cfg.train.val_annot_folder == 'data/VisualTB-voc/val'


def test_legacy_fasterrcnn_name_selects_vgg16_backend(tmp_path):
    """BaseTracker.py:53-60 dispatches on the detector name; the legacy
    'FasterRCNN' maps to this framework's VGG16 backend."""
    d = dict(LEGACY)
    d['model_detector'] = {'name': 'FasterRCNN'}
    p = tmp_path / 'config.json'
    p.write_text(json.dumps(d))
    assert load_config(str(p)).detector.backend == 'vgg16'


def test_new_layout_roundtrip(tmp_path):
    cfg = Config()
    cfg.detector.backend = 'vgg16'
    cfg.joint.convlstm_layers = 3
    cfg.joint.time_shards = 2
    cfg.train.classes = ('a',)
    p = tmp_path / 'config.json'
    p.write_text(cfg.to_json())
    back = load_config(str(p))
    assert back.detector.backend == 'vgg16'
    assert back.joint.convlstm_layers == 3
    assert back.joint.time_shards == 2
    assert back.train.classes == ('a',)
