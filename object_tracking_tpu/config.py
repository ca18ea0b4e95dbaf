"""One typed config tree for the whole framework.

The reference splits configuration between `config.json` (single-object
pipeline + converters; /root/reference/config.json) and Python class
constants (detector + joint pipeline; models_detection/KerasYOLO.py:37-63,
models_tracking/MultiObjDetTracker.py:82-116) — an asymmetry its own README
flags. Here a single dataclass tree covers both pipelines and is
JSON-round-trippable, including the ability to load the reference's legacy
config.json layout.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

# Anchor priors (grid-cell units) — YOLOv2 COCO anchors
# (reference: models_detection/KerasYOLO.py:45)
YOLOV2_ANCHORS: Tuple[float, ...] = (
    0.57273, 0.677385, 1.87446, 2.06253, 3.33843,
    5.47434, 7.88282, 3.52778, 9.77052, 9.16828,
)

# Track-association IoU gate shared by every identity-assignment layer
# (ops/matching.assign_tracks, TrackManager, inference.JointPredictor).
# SORT-style permissive 0.3: at 0.5 an object moving ~a quarter
# box-width per frame diagonally fails its own next-frame match and
# fragments into new ids (ADVICE r3: one constant so the layers can't
# drift). NOT the NMS threshold and NOT the eval match threshold.
TRACK_GATE_IOU: float = 0.3

# Label sets (reference: KerasYOLO.py:20-37, MultiObjDetTracker.py:70-80)
LABELS_COCO: Tuple[str, ...] = (
    'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus',
    'train', 'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
    'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse',
    'sheep', 'cow', 'elephant', 'bear', 'zebra', 'giraffe',
    'backpack', 'umbrella', 'handbag', 'tie', 'suitcase', 'frisbee',
    'skis', 'snowboard', 'sports ball', 'kite', 'baseball bat',
    'baseball glove', 'skateboard', 'surfboard', 'tennis racket', 'bottle',
    'wine glass', 'cup', 'fork', 'knife', 'spoon', 'bowl', 'banana',
    'apple', 'sandwich', 'orange', 'broccoli', 'carrot', 'hot dog',
    'pizza', 'donut', 'cake', 'chair', 'couch', 'potted plant', 'bed',
    'dining table', 'toilet', 'tv', 'laptop', 'mouse', 'remote',
    'keyboard', 'cell phone', 'microwave', 'oven', 'toaster', 'sink',
    'refrigerator', 'book', 'clock', 'vase', 'scissors', 'teddy bear',
    'hair drier', 'toothbrush',
)

LABELS_MOT17: Tuple[str, ...] = tuple(str(i) for i in range(1, 13))

LABELS_IMAGENET_VID: Tuple[str, ...] = (
    'n02691156', 'n02419796', 'n02131653', 'n02834778', 'n01503061',
    'n02924116', 'n02958343', 'n02402425', 'n02084071', 'n02121808',
    'n02503517', 'n02118333', 'n02510455', 'n02342885', 'n02374451',
    'n02129165', 'n01674464', 'n02484322', 'n03790512', 'n02324045',
    'n02509815', 'n02411705', 'n01726692', 'n02355227', 'n02129604',
    'n04468005', 'n01662784', 'n04530566', 'n02062744', 'n02391049',
)

# Human-readable maps (reference: MultiObjDetTracker.py:20-66)
MOT17_LABEL_MAP: Dict[str, str] = {
    '1': 'Pedestrian', '2': 'Person on vehicle', '3': 'Car', '4': 'Bicycle',
    '5': 'Motorbike', '6': 'Non motorized vehicle', '7': 'Static person',
    '8': 'Distractor', '9': 'Occluder', '10': 'Occluder on the ground',
    '11': 'Occluder full', '12': 'Reflection',
}

IMAGENET_VID_LABEL_MAP: Dict[str, str] = {
    'n02691156': 'airplane', 'n02419796': 'antelope', 'n02131653': 'bear',
    'n02834778': 'bicycle', 'n01503061': 'bird', 'n02924116': 'bus',
    'n02958343': 'car', 'n02402425': 'cattle', 'n02084071': 'dog',
    'n02121808': 'domestic cat', 'n02503517': 'elephant',
    'n02118333': 'fox', 'n02510455': 'giant panda', 'n02342885': 'hamster',
    'n02374451': 'horse', 'n02129165': 'lion', 'n01674464': 'lizard',
    'n02484322': 'monkey', 'n03790512': 'motorcycle', 'n02324045': 'rabbit',
    'n02509815': 'red panda', 'n02411705': 'sheep', 'n01726692': 'snake',
    'n02355227': 'squirrel', 'n02129604': 'tiger', 'n04468005': 'train',
    'n01662784': 'turtle', 'n04530566': 'watercraft', 'n02062744': 'whale',
    'n02391049': 'zebra',
}


@dataclass
class DetectorConfig:
    """YOLOv2 detector (reference: KerasYOLO.py class constants)."""
    labels: Tuple[str, ...] = LABELS_COCO
    image_h: int = 416
    image_w: int = 416
    grid_h: int = 13
    grid_w: int = 13
    num_anchors: int = 5
    anchors: Tuple[float, ...] = YOLOV2_ANCHORS
    obj_threshold: float = 0.5    # KerasYOLO.py:43
    nms_threshold: float = 0.45   # KerasYOLO.py:44
    weights_path: Optional[str] = None  # darknet yolov2.weights (KerasYOLO.py:59)
    # Frozen prior-source backend for the single-object pipeline:
    # 'yolo' (TPU YOLOv2 — reference's darknet path), 'vgg16' (TPU VGG16
    # with dense detection head — reference's FasterRCNN path,
    # BaseTracker.py:53-60 selects by config name), or 'fake'
    # (deterministic hermetic priors for tests).
    backend: str = 'yolo'
    # VGG16 backend weights: .npz of named arrays (see
    # models/vgg16.py::VGG16PriorSource.load_npz_weights).
    vgg_weights_path: Optional[str] = None
    # VGG16 backend geometry: fc6/fc7 width and channel divisor (the
    # committed golden fixture is a width_div=8, fc_features=128 variant
    # of the same 13-conv topology; 4096/1 = the standard VGG16).
    vgg_fc_features: int = 4096
    vgg_width_div: int = 1
    # Optional darknet .cfg describing the detector graph. The reference
    # feeds any cfg to the darknet C loader (config.json:4 → YOLO.py:128);
    # here models/darknet_cfg.py compiles it to a flax module. When None,
    # the hand-built Darknet-19/YOLOv2 module is used.
    cfg_path: Optional[str] = None
    # Feature layer whose activations the single-object trackers consume.
    # The reference exposes darknet layer 25 (config.json:9); our detector
    # exposes named taps — 'conv_feat' is the Layer-22 activation the joint
    # model consumes (KerasYOLO.py:396).
    feature_layer: str = 'conv_feat'
    batch_size: int = 32          # KerasYOLO.py:52
    # Backbone channel-width divisor for the hand-built Darknet-19 (and
    # the joint model built on it): 1 = reference widths; >1 = same
    # topology/taps at 1/width_div channels (min 4) — fixture/CI scale
    # and a deployment knob for narrow feature extraction. See
    # models/darknet19.py::Darknet19.width_div.
    width_div: int = 1

    @property
    def num_classes(self) -> int:
        return len(self.labels)


@dataclass
class LossConfig:
    """YOLOv2 loss scales (reference: KerasYOLO.py:47-54)."""
    no_object_scale: float = 1.0
    object_scale: float = 5.0
    coord_scale: float = 1.0
    class_scale: float = 1.0
    warm_up_batches: int = 0      # KerasYOLO.py:53
    true_box_buffer: int = 50     # KerasYOLO.py:54
    best_iou_threshold: float = 0.6  # KerasYOLO.py:179


@dataclass
class TrackerConfig:
    """Single-object tracker (reference: config.json 'model_tracker')."""
    name: str = 'TinyTracker'     # or 'TinyHeatmapTracker'
    lstm_units: int = 512
    sequence_length: int = 4
    heatmap_size: int = 32
    pool: str = 'Global'          # 'Global' or 'Max' (config.json:33)
    # 'bce' = reference parity (Keras binary_crossentropy on the sigmoid
    # bbox outputs, TinyTracker.py:40); 'huber' = production smooth-L1 —
    # BCE against continuous coordinates bottoms out at the targets'
    # entropy with vanishing gradients, huber trains the bbox head to a
    # tight fit.
    loss: str = 'bce'
    # Production bbox head: predict a zero-initialized tanh correction
    # to the detection input (model == detector echo at init) instead of
    # the reference's from-scratch sigmoid head — see
    # models/tiny_tracker.py::TinyTracker.residual_det.
    residual: bool = False
    # Per-frame probability of zeroing the detection input during
    # training/eval — simulates the frozen detector missing a frame
    # (the pipeline emits a zero box then anyway,
    # preprocessing.py:434-449); the regime where the tracker's
    # temporal fill-in must beat plain detector echo.
    det_dropout: float = 0.0


@dataclass
class JointConfig:
    """Joint detect+track model (reference: MultiObjDetTracker.py:82-116)."""
    labels: Tuple[str, ...] = LABELS_MOT17
    batch_size: int = 1
    sequence_length: int = 4
    convlstm_features: int = 512  # MultiObjDetTracker.py:176
    loss_weight_track: float = 0.7   # MultiObjDetTracker.py:278
    loss_weight_detect: float = 0.3
    # 'bfloat16' activations keep convs on the MXU fast path (params and
    # losses stay float32); 'float32' for parity debugging.
    compute_dtype: str = 'float32'
    # Rematerialize the per-frame detector in backward (jax.checkpoint):
    # HBM-for-FLOPs so sequence_length can grow far past 4.
    remat: bool = False
    # > 0 uses the mixture-of-experts tracking head (models/moe_head.py;
    # expert axis shards over the mesh `model` axis = expert parallelism).
    moe_experts: int = 0
    moe_hidden: int = 256
    # Switch-style load-balancing auxiliary loss weight (only active when
    # the MoE head is, i.e. the model sows 'moe_aux_loss').
    moe_aux_weight: float = 0.01
    # > 1 shards the ConvLSTM's time axis over the mesh `data` axis via
    # parallel/context.py::context_parallel_scan (sequence parallelism for
    # long clips — each device materializes T/time_shards activations).
    # Must divide sequence_length and equal the mesh data-axis size.
    time_shards: int = 1
    # Total ConvLSTM depth of the tracking head (layer 0 projects the
    # detector features; layers 1..L-1 are homogeneous F→F).
    convlstm_layers: int = 1
    # True runs the stacked layers pipeline-parallel over the mesh
    # `model` axis (parallel/pipeline.py wavefront; one layer's weights
    # per device). Requires mesh model-axis size == convlstm_layers - 1.
    pp_layers: bool = False


@dataclass
class TrainConfig:
    """Training hyperparams + callback stack (reference: BaseTracker.py:71-112,
    MultiObjDetTracker.py:247-288, config.json 'train')."""
    train_image_folder: str = 'data/VisualTB/'
    train_annot_folder: str = 'data/VisualTBAnn/train/'
    val_image_folder: str = 'data/VisualTB/'
    val_annot_folder: str = 'data/VisualTBAnn/val/'
    batch_size: int = 4
    max_epochs: int = 100
    learning_rate: float = 1e-3          # TinyTracker.py:40 (Adam)
    joint_learning_rate: float = 1e-4    # MultiObjDetTracker.py:274
    # Global-norm gradient clipping (optax.clip_by_global_norm); None
    # disables. From-scratch YOLO training needs it: the exp(tw) box
    # decode in the loss can explode early (no reference analogue — the
    # reference always starts from pretrained darknet weights).
    grad_clip_norm: Optional[float] = None
    early_stop_patience: int = 10        # BaseTracker.py:82-86
    reduce_lr_factor: float = 0.5        # BaseTracker.py:88-94
    reduce_lr_patience: int = 5
    # Plateau patience for the JOINT flow. The reference hardcodes 2
    # (MultiObjDetTracker.py:261-266) — kept as the default — but on
    # hard scenes a noisy val loss trips patience-2 reductions within a
    # few epochs and parks the lr at min_lr long before convergence;
    # harnesses raise this for from-scratch runs.
    joint_reduce_lr_patience: int = 2
    min_lr: float = 1e-5                 # MultiObjDetTracker.py:266
    tensorboard_dir: str = 'logs/'
    saved_model_dir: str = 'models/'
    classes: Tuple[str, ...] = ('Person', 'Car')   # config.json:39
    debug: bool = False                  # config.json:41 — dump aug images
    seed: int = 0
    max_boxes_per_image: int = 50
    resume: bool = False                 # MultiObjDetTracker.py:104 LOAD_MODEL
    # Override the restored learning rate on resume. The optimizer's lr
    # lives in opt_state (inject_hyperparams) and restores with it, so a
    # plateau-reduced rate follows the checkpoint — right for continuing
    # an interrupted run, wrong for cross-resolution fine-tuning, where
    # the new data distribution needs a fresh rate.
    resume_lr: Optional[float] = None
    checkpoint_dir: str = 'checkpoints/'
    # Save every N epochs (final epoch always saves). 1 = the
    # reference's checkpoint-per-epoch (MultiObjDetTracker.py:253-259);
    # larger values trade resume granularity for wall clock — each save
    # ships the full train state device→host.
    checkpoint_every_epochs: int = 1
    augment: bool = True
    log_every_steps: int = 1
    # Non-empty enables the parsed-annotation pickle cache (reference
    # parity: KerasYOLO.py:421-439), keyed by XML set + mtime.
    annotation_cache_dir: str = ''
    # Device-resident data path for the joint pipeline (VERDICT r4 #1):
    # the generator emits raw uint8 batches and the train step's ONE
    # jitted program does normalize + augmentation + target encoding +
    # forward/backward — no augment→host→device image round trip, 4x
    # smaller host→device transfers, and the prefetch thread never
    # touches the device. False restores the legacy host-side
    # generator pipeline (always used when train.debug is set, which
    # needs the augmented pixels on host to dump).
    device_data: bool = True


@dataclass
class MeshConfig:
    """Device-mesh parallelism (no reference analogue — the reference pins
    two processes to two GPUs by env var, BaseTracker.py:40-48; here we use
    one jax.sharding.Mesh with named axes over ICI)."""
    data_axis: str = 'data'
    model_axis: str = 'model'
    # -1 means "all remaining devices"
    data_parallel: int = -1
    model_parallel: int = 1
    # Multi-host (DCN) wiring: when True, parallel.mesh.distributed_init
    # calls jax.distributed.initialize before any device query, so
    # jax.devices() spans every host's chips and the same pjit program
    # runs across DCN (SURVEY.md §5). The None/-1 defaults defer to the
    # TPU environment's auto-detection (megascale coordinator).
    distributed: bool = False
    coordinator_address: Optional[str] = None
    num_processes: int = -1
    process_id: int = -1


@dataclass
class Config:
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    joint: JointConfig = field(default_factory=JointConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> 'Config':
        def build(dc_cls, sub):
            kwargs = {}
            for f in dataclasses.fields(dc_cls):
                if f.name in sub:
                    v = sub[f.name]
                    if isinstance(v, list):
                        v = tuple(v)
                    kwargs[f.name] = v
            return dc_cls(**kwargs)

        return cls(
            detector=build(DetectorConfig, d.get('detector', {})),
            loss=build(LossConfig, d.get('loss', {})),
            tracker=build(TrackerConfig, d.get('tracker', {})),
            joint=build(JointConfig, d.get('joint', {})),
            train=build(TrainConfig, d.get('train', {})),
            mesh=build(MeshConfig, d.get('mesh', {})),
        )

    @classmethod
    def from_legacy_json(cls, d: Dict[str, Any]) -> 'Config':
        """Load the reference's config.json layout
        (/root/reference/config.json — 'model_detector' / 'model_tracker' /
        'train' / 'val' blocks)."""
        cfg = cls()
        md = d.get('model_detector', {})
        if 'name' in md:
            # BaseTracker.py:53-60 dispatches on this name: 'YOLO' →
            # darknet, 'FasterRCNN' → pycaffe VGG16. Here: TPU backends.
            cfg.detector.backend = (
                'vgg16' if md['name'] == 'FasterRCNN' else 'yolo')
        if 'nms' in md:
            cfg.detector.nms_threshold = float(md['nms'])
        if 'thresh' in md:
            cfg.detector.obj_threshold = float(md['thresh'])
        if 'weights_file' in md:
            cfg.detector.weights_path = md['weights_file']
        if 'config_file' in md:
            cfg.detector.cfg_path = md['config_file']
        mt = d.get('model_tracker', {})
        for src, dst in [('name', 'name'), ('lstm_units', 'lstm_units'),
                         ('sequence_length', 'sequence_length'),
                         ('heatmap_size', 'heatmap_size')]:
            if src in mt:
                setattr(cfg.tracker, dst, mt[src])
        tr = d.get('train', {})
        for src, dst in [('train_image_folder', 'train_image_folder'),
                         ('train_annot_folder', 'train_annot_folder'),
                         ('batch_size', 'batch_size'),
                         ('max_epochs', 'max_epochs'),
                         ('tensorboard_dir', 'tensorboard_dir'),
                         ('saved_model_dir', 'saved_model_dir')]:
            if src in tr:
                setattr(cfg.train, dst, tr[src])
        if 'pool' in tr:
            cfg.tracker.pool = tr['pool']
        if 'classes' in tr:
            cfg.train.classes = tuple(tr['classes'])
        if 'debug' in tr:
            cfg.train.debug = bool(tr['debug'])
        va = d.get('val', {})
        if 'val_image_folder' in va:
            cfg.train.val_image_folder = va['val_image_folder']
        if 'val_annot_folder' in va:
            cfg.train.val_annot_folder = va['val_annot_folder']
        return cfg


def load_config(path: str) -> Config:
    with open(path) as f:
        d = json.load(f)
    if 'model_detector' in d or 'model_tracker' in d:
        return Config.from_legacy_json(d)
    return Config.from_dict(d)
