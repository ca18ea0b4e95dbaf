"""VGG16 prior source — the TPU-native replacement for the Caffe
FasterRCNN feature path.

The reference's second frozen-detector backend is pycaffe FasterRCNN
(/root/reference/models_detection/FasterRCNN.py): VGG16 `fc7` visual
features + per-class-NMS'd detections consumed by the single-object
tracker pipeline (`extract_spatio_info`, FasterRCNN.py:62-81). Caffe and
CUDA don't exist on TPU, so per SURVEY.md §7 the *capability* is rebuilt
as a pluggable prior source: a pure-flax VGG16 backbone supplies the
visual features ('conv5_3', 'pool5', or the global 'fc7' vector — the
reference's tracker consumes exactly one feature volume per frame,
BaseTracker.py:60), and detections come from a detection delegate (any
prior source, by default the YOLOv2 detector) since box priors and
feature volumes are orthogonal here.

Weights load from an `.npz` of named arrays (conv1_1/kernel … fc7/bias,
HWIO layout) — e.g. exported once from any public VGG16 checkpoint — or
stay at a fixed random init for hermetic use.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (name, features) per conv layer; pools after each block.
_VGG_PLAN: Tuple[Tuple[str, int], ...] = (
    ('conv1_1', 64), ('conv1_2', 64),
    ('conv2_1', 128), ('conv2_2', 128),
    ('conv3_1', 256), ('conv3_2', 256), ('conv3_3', 256),
    ('conv4_1', 512), ('conv4_2', 512), ('conv4_3', 512),
    ('conv5_1', 512), ('conv5_2', 512), ('conv5_3', 512),
)
_BLOCK_ENDS = frozenset(('conv1_2', 'conv2_2', 'conv3_3', 'conv4_3'))


# Single implicit anchor (grid-cell units) for the dense detection head.
VGG_DET_ANCHOR = (2.0, 2.0)


class VGG16(nn.Module):
    """VGG16 backbone. Returns conv5_3, pool5, and a global fc7 vector —
    plus, when `det_classes > 0`, a dense detection head.

    fc6/fc7 are implemented as convolutions over the pooled map followed
    by global average pooling — shape-agnostic, so any input resolution
    works (the Caffe original fixes 7x7 ROIs; a frozen feature extractor
    has no ROI pooling to anchor that).

    The detection head replaces the Caffe pipeline's RPN + per-ROI
    classifier (`im_detect` → per-class scores/boxes,
    /root/reference/models_detection/FasterRCNN.py:62-81) with the
    TPU-friendly dense formulation this framework uses everywhere: one
    1x1 conv over pool5 emitting a single-anchor region-style netout
    (B, GH, GW, 1, 5+C), decoded and per-class-NMS'd by the verified
    ops/decode path. Capability parity (per-class NMS'd detections AND
    visual features from ONE model), not architecture translation: ROI
    pooling's dynamic shapes would defeat XLA tiling on the MXU.
    """
    fc_features: int = 4096
    det_classes: int = 0
    dtype: Any = jnp.float32
    # Channel divisor for fixture-scale variants (same 13-conv topology,
    # 1/width_div the channels — like tests/fixtures yolov2-micro vs the
    # full yolov2): 1 = the standard VGG16 widths.
    width_div: int = 1

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images (B, H, W, 3) in [0, 1] →
        {'conv5_3': (B,H/16,W/16,512), 'pool5': (B,H/32,W/32,512),
         'fc7': (B, fc_features)[, 'det_netout': (B,GH,GW,1,5+C)]}."""
        x = images.astype(self.dtype)
        for name, feats in _VGG_PLAN:
            x = nn.Conv(max(feats // self.width_div, 4), (3, 3),
                        padding='SAME', dtype=self.dtype,
                        name=name)(x)
            x = nn.relu(x)
            if name in _BLOCK_ENDS:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        conv5_3 = x
        pool5 = nn.max_pool(x, (2, 2), strides=(2, 2))

        y = nn.Conv(self.fc_features, (7, 7), padding='SAME',
                    dtype=self.dtype, name='fc6')(pool5)
        y = nn.relu(y)
        y = nn.Conv(self.fc_features, (1, 1), padding='SAME',
                    dtype=self.dtype, name='fc7')(y)
        y = nn.relu(y)
        fc7 = jnp.mean(y, axis=(1, 2))
        out = {'conv5_3': conv5_3.astype(jnp.float32),
               'pool5': pool5.astype(jnp.float32),
               'fc7': fc7.astype(jnp.float32)}
        if self.det_classes:
            b, gh, gw, _ = pool5.shape
            det = nn.Conv(5 + self.det_classes, (1, 1),
                          dtype=self.dtype, name='det_head')(pool5)
            out['det_netout'] = det.astype(jnp.float32).reshape(
                b, gh, gw, 1, 5 + self.det_classes)
        return out


class VGG16PriorSource:
    """Frozen VGG16 features + detections, implementing the prior-source
    protocol (`get_layer_dims`, `forward_batch`, `extract_spatio_info`)
    consumed by TrackerSequenceBatches — the same surface the reference
    obtains from pycaffe (FasterRCNN.py:62-81).

    Detections come from the model's OWN dense head when
    `det_labels` is given (FasterRCNN parity: one model yields both
    per-class NMS'd boxes and the visual feature; thresholds default to
    the reference's CONF_THRESH=0.8 / NMS_THRESH=0.3, FasterRCNN.py:63,
    74), or from `detection_delegate` (any other prior source) otherwise.
    """

    def __init__(self, image_h: int = 416, image_w: int = 416,
                 detection_delegate=None, weights_path: Optional[str] = None,
                 det_labels: Optional[Sequence[str]] = None,
                 conf_threshold: float = 0.8, nms_threshold: float = 0.3,
                 seed: int = 0, dtype=jnp.float32,
                 fc_features: int = 4096, width_div: int = 1):
        self.image_h, self.image_w = image_h, image_w
        self.det_labels = tuple(det_labels) if det_labels else ()
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold
        self.module = VGG16(dtype=dtype, det_classes=len(self.det_labels),
                            fc_features=fc_features, width_div=width_div)
        dummy = jnp.zeros((1, image_h, image_w, 3), jnp.float32)
        self.variables = self.module.init(jax.random.PRNGKey(seed), dummy)
        if weights_path:
            self.load_npz_weights(weights_path)
        self.delegate = detection_delegate
        self._forward = jax.jit(lambda v, x: self.module.apply(v, x))

    def det_apply(self, variables, images, train: bool = False,
                  mutable=False):
        """Adapter exposing the detection head under the
        {'netout': ...} contract of training.steps.make_detector_train_step
        (anchors = VGG_DET_ANCHOR), so the head is trainable in-framework
        — the reference's FasterRCNN is inference-only."""
        # VGG16 has no BatchNorm: the generic detector step passes
        # batch_stats=None, which flax rejects as a collection.
        variables = {k: v for k, v in variables.items() if v}
        out = self.module.apply(variables, images, mutable=mutable)
        if mutable:
            out, updates = out
            return {'netout': out['det_netout']}, updates
        return {'netout': out['det_netout']}

    def load_npz_weights(self, path: str) -> None:
        """Load named arrays (e.g. 'conv1_1/kernel' HWIO, 'fc6/bias')."""
        import flax
        data = np.load(path)
        params = flax.core.unfreeze(self.variables['params'])
        for key in data.files:
            name, leaf = key.split('/')
            params[name][leaf] = jnp.asarray(data[key]).reshape(
                params[name][leaf].shape)
        self.variables = {'params': params}

    def get_layer_dims(self, layer: str = 'fc7') -> Tuple[int, int, int]:
        c5 = max(512 // self.module.width_div, 4)
        if layer == 'conv5_3':
            return self.image_h // 16, self.image_w // 16, c5
        if layer == 'pool5':
            return self.image_h // 32, self.image_w // 32, c5
        if layer == 'fc7':
            # The reference treats the fc feature as a 1x1 spatial volume
            # (BaseTracker.py:60 hardcodes a 1x1 feature map).
            return 1, 1, self.module.fc_features
        raise KeyError(layer)

    def _features(self, images: np.ndarray, layer: str) -> np.ndarray:
        out = self._forward(self.variables,
                            jnp.asarray(images, jnp.float32))
        feats = out[layer]
        if layer == 'fc7':
            feats = feats[:, None, None, :]
        return np.asarray(feats)

    def _own_detections(self, images: np.ndarray, top_k: int):
        """Dense-head decode + per-class NMS for a batch (device)."""
        from object_tracking_tpu.ops.decode import decode_and_nms
        out = self._forward(self.variables,
                            jnp.asarray(images, jnp.float32))
        dec = jax.vmap(lambda n: decode_and_nms(
            n, jnp.asarray(VGG_DET_ANCHOR, jnp.float32),
            obj_threshold=self.conf_threshold,
            nms_threshold=self.nms_threshold,
            top_k=top_k))(out['det_netout'])
        return tuple(map(np.asarray, dec))

    def forward_batch(self, images: np.ndarray, layer: str = 'fc7',
                      top_k: int = 16):
        """(feats, boxes, labels, scores, valid) — features from VGG16,
        boxes from the model's own head (when det_labels set), else the
        delegate, else zero/invalid boxes."""
        feats = self._features(images, layer)
        n = images.shape[0]
        if self.det_labels:
            boxes, labels, scores, valid = self._own_detections(
                images, top_k)
        elif self.delegate is not None:
            _, boxes, labels, scores, valid = self.delegate.forward_batch(
                images, top_k=top_k)
        else:
            boxes = np.zeros((n, top_k, 4), np.float32)
            labels = np.zeros((n, top_k), np.int32)
            scores = np.zeros((n, top_k), np.float32)
            valid = np.zeros((n, top_k), bool)
        return feats, boxes, labels, scores, valid

    def detect(self, file_path: str,
               class_filter: Optional[Sequence[str]] = None):
        """Image path → [(label, score, (cx, cy, w, h))] sorted by score,
        from the model's own per-class NMS'd head — the detection half of
        FasterRCNN.extract_spatio_info (FasterRCNN.py:62-78)."""
        named, _ = self.extract_spatio_info(file_path,
                                            class_filter=class_filter)
        return named

    def extract_spatio_info(self, file_path: str, layer: str = 'fc7',
                            class_filter: Optional[Sequence[str]] = None):
        """Detections + feature volume for one image file
        (FasterRCNN.py:62-81 surface: both come from ONE model when the
        detection head is enabled)."""
        import cv2
        img = cv2.imread(file_path)
        if img is None:
            raise FileNotFoundError(file_path)
        img = cv2.resize(img, (self.image_w, self.image_h))[:, :, ::-1]
        x = np.asarray(img, np.float32)[None] / 255.0
        feats = self._features(x, layer)[0]
        named = []
        if self.det_labels:
            boxes, labels, scores, valid = self._own_detections(x, 16)
            named = sorted(
                [(self.det_labels[int(l)].lower(), float(s),
                  tuple(map(float, b)))
                 for b, l, s, ok in zip(boxes[0], labels[0], scores[0],
                                        valid[0]) if ok],
                key=lambda d: -d[1])
        elif self.delegate is not None and hasattr(self.delegate,
                                                   'extract_spatio_info'):
            named, _ = self.delegate.extract_spatio_info(
                file_path, class_filter=class_filter)
            class_filter = None
        if class_filter is not None:
            allowed = {c.lower() for c in class_filter}
            named = [d for d in named if d[0] in allowed]
        return named, feats
