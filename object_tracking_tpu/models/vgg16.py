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


class VGG16(nn.Module):
    """VGG16 backbone. Returns conv5_3, pool5, and a global fc7 vector.

    fc6/fc7 are implemented as convolutions over the pooled map followed
    by global average pooling — shape-agnostic, so any input resolution
    works (the Caffe original fixes 7x7 ROIs; a frozen feature extractor
    has no ROI pooling to anchor that).
    """
    fc_features: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images (B, H, W, 3) in [0, 1] →
        {'conv5_3': (B,H/16,W/16,512), 'pool5': (B,H/32,W/32,512),
         'fc7': (B, fc_features)}."""
        x = images.astype(self.dtype)
        for name, feats in _VGG_PLAN:
            x = nn.Conv(feats, (3, 3), padding='SAME', dtype=self.dtype,
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
        return {'conv5_3': conv5_3.astype(jnp.float32),
                'pool5': pool5.astype(jnp.float32),
                'fc7': fc7.astype(jnp.float32)}


class VGG16PriorSource:
    """Frozen VGG16 features + delegated detections, implementing the
    prior-source protocol (`get_layer_dims`, `forward_batch`,
    `extract_spatio_info`) consumed by TrackerSequenceBatches — the same
    surface the reference obtains from pycaffe (FasterRCNN.py:62-81)."""

    def __init__(self, image_h: int = 416, image_w: int = 416,
                 detection_delegate=None, weights_path: Optional[str] = None,
                 seed: int = 0, dtype=jnp.float32):
        self.image_h, self.image_w = image_h, image_w
        self.module = VGG16(dtype=dtype)
        dummy = jnp.zeros((1, image_h, image_w, 3), jnp.float32)
        self.variables = self.module.init(jax.random.PRNGKey(seed), dummy)
        if weights_path:
            self.load_npz_weights(weights_path)
        self.delegate = detection_delegate
        self._forward = jax.jit(lambda v, x: self.module.apply(v, x))

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
        if layer == 'conv5_3':
            return self.image_h // 16, self.image_w // 16, 512
        if layer == 'pool5':
            return self.image_h // 32, self.image_w // 32, 512
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

    def forward_batch(self, images: np.ndarray, layer: str = 'fc7',
                      top_k: int = 16):
        """(feats, boxes, labels, scores, valid) — features from VGG16,
        boxes from the delegate (zero/invalid boxes if none)."""
        feats = self._features(images, layer)
        n = images.shape[0]
        if self.delegate is not None:
            _, boxes, labels, scores, valid = self.delegate.forward_batch(
                images, top_k=top_k)
        else:
            boxes = np.zeros((n, top_k, 4), np.float32)
            labels = np.zeros((n, top_k), np.int32)
            scores = np.zeros((n, top_k), np.float32)
            valid = np.zeros((n, top_k), bool)
        return feats, boxes, labels, scores, valid

    def extract_spatio_info(self, file_path: str, layer: str = 'fc7',
                            class_filter: Optional[Sequence[str]] = None):
        """Detections + feature volume for one image file
        (FasterRCNN.py:62-81 surface)."""
        import cv2
        img = cv2.imread(file_path)
        if img is None:
            raise FileNotFoundError(file_path)
        img = cv2.resize(img, (self.image_w, self.image_h))[:, :, ::-1]
        x = np.asarray(img, np.float32)[None] / 255.0
        feats = self._features(x, layer)[0]
        named = []
        if self.delegate is not None and hasattr(self.delegate,
                                                 'extract_spatio_info'):
            named, _ = self.delegate.extract_spatio_info(
                file_path, class_filter=class_filter)
        return named, feats
