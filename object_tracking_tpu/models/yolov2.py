"""User-facing YOLOv2 detector: build, load darknet weights, predict, extract.

The capability surface mirrors the reference's KerasYOLO
(/root/reference/models_detection/KerasYOLO.py): constructor override of
labels/grid/batch, darknet `.weights` ingestion, `predict(input, output)`
drawing boxes to disk, `extract(input, layer)` intermediate features — and
additionally the frozen-detector surface of the darknet ctypes wrapper
(models_detection/YOLO.py:136-180): `get_layer_dims`, `detect`,
`extract_spatio_info`, so TinyTracker's data pipeline can consume this
TPU detector as its prior source instead of a C library.

All compute is one jitted program per (batch-shape); decode+NMS run on
device (ops/decode.py), not in a host loop.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.config import DetectorConfig
from object_tracking_tpu.models.darknet19 import Darknet19
from object_tracking_tpu.ops.decode import boxes_to_list, decode_and_nms
from object_tracking_tpu.ops.weights import load_yolov2_weights


def _read_image_rgb(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img[:, :, ::-1]  # BGR → RGB (preprocessing.py:169)


def rerandomize_head(variables, key, grid_h: int, grid_w: int,
                     layer: str = 'conv_23'):
    """Re-randomize the last conv before fine-tuning, reproducing
    MultiObjDetTracker.py:221-228 / KerasYOLO.py:448-455:
    N(0,1)/ (GH·GW) for kernel and bias."""
    import flax
    params = flax.core.unfreeze(variables['params'])

    def visit(tree):
        if layer in tree:
            k1, k2 = jax.random.split(key)
            kern = tree[layer]['kernel']
            tree[layer]['kernel'] = (
                jax.random.normal(k1, kern.shape, kern.dtype)
                / (grid_h * grid_w))
            if 'bias' in tree[layer]:
                bias = tree[layer]['bias']
                tree[layer]['bias'] = (
                    jax.random.normal(k2, bias.shape, bias.dtype)
                    / (grid_h * grid_w))
            return True
        return any(visit(v) for v in tree.values()
                   if isinstance(v, dict))

    if not visit(params):
        raise KeyError(f'{layer} not found in params')
    return {**variables, 'params': params}


class YOLOv2Detector:
    """Stateful convenience wrapper around the pure Darknet19 module."""

    def __init__(self, config: Optional[DetectorConfig] = None,
                 seed: int = 0, dtype=jnp.float32):
        self.config = config or DetectorConfig()
        cfg = self.config
        self.module = Darknet19(num_classes=cfg.num_classes,
                                num_anchors=cfg.num_anchors, dtype=dtype,
                                width_div=cfg.width_div)
        dummy = jnp.zeros((1, cfg.image_h, cfg.image_w, 3), jnp.float32)
        self.variables = self.module.init(jax.random.PRNGKey(seed), dummy)
        if cfg.weights_path:
            self.load_darknet_weights(cfg.weights_path)

        self._forward = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))

    # -- weights ---------------------------------------------------------
    def load_darknet_weights(self, path: str) -> None:
        loaded = load_yolov2_weights(path, self.config.num_classes,
                                     self.config.num_anchors)
        import flax
        params = flax.core.unfreeze(self.variables['params'])
        stats = flax.core.unfreeze(self.variables['batch_stats'])
        for name, leaf in loaded['params'].items():
            for k, v in leaf.items():
                params[name][k] = jnp.asarray(v).reshape(
                    params[name][k].shape)
        for name, leaf in loaded['batch_stats'].items():
            for k, v in leaf.items():
                stats[name][k] = jnp.asarray(v)
        self.variables = {'params': params, 'batch_stats': stats}

    # -- pure forward ----------------------------------------------------
    def forward(self, images: jnp.ndarray):
        """images (B, H, W, 3) in [0, 1] → {'netout', 'conv_feat'}."""
        return self._forward(self.variables, images)

    def _prep(self, path: str) -> Tuple[np.ndarray, jnp.ndarray]:
        import cv2
        cfg = self.config
        image = _read_image_rgb(path)
        resized = cv2.resize(image, (cfg.image_w, cfg.image_h))
        x = jnp.asarray(resized, jnp.float32)[None] / 255.0
        return image, x

    # -- reference-parity API -------------------------------------------
    def predict(self, input_path: str, output_path: Optional[str] = None
                ) -> List[Tuple[str, float, Tuple[float, ...]]]:
        """Detect objects in an image; optionally draw + save
        (KerasYOLO.py:522-537). Returns [(label, score, (cx, cy, w, h))]
        with image-relative coordinates."""
        cfg = self.config
        image, x = self._prep(input_path)
        netout = self.forward(x)['netout'][0]
        dets = boxes_to_list(*decode_and_nms(
            netout, jnp.asarray(cfg.anchors), obj_threshold=cfg.obj_threshold,
            nms_threshold=cfg.nms_threshold))
        named = [(cfg.labels[l], s, b) for l, s, b in dets]
        if output_path:
            self._draw(image, named, output_path)
        return named

    def _draw(self, image_rgb: np.ndarray, dets, output_path: str) -> None:
        """cv2 overlay, reproducing utility/utils.py:190-206 draw_boxes."""
        import cv2
        img = np.ascontiguousarray(image_rgb[:, :, ::-1])
        ih, iw = img.shape[:2]
        for label, score, (cx, cy, w, h) in dets:
            x1, x2 = int((cx - w / 2) * iw), int((cx + w / 2) * iw)
            y1, y2 = int((cy - h / 2) * ih), int((cy + h / 2) * ih)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 3)
            cv2.putText(img, f'{label} {score:.2f}', (x1, y1 - 13),
                        cv2.FONT_HERSHEY_SIMPLEX, 1e-3 * ih, (0, 255, 0), 2)
        cv2.imwrite(output_path, img)

    def detect(self, input_path: str
               ) -> List[Tuple[str, float, Tuple[float, ...]]]:
        """Detections for one image, sorted by score — the darknet
        `detect` capability (models_detection/YOLO.py:140-162)."""
        return self.predict(input_path)

    def extract(self, input_path: str, layer: str = 'conv_feat'
                ) -> np.ndarray:
        """Intermediate feature volume for one image (KerasYOLO.py:509-520).
        `layer` ∈ {'conv_feat', 'netout'}."""
        _, x = self._prep(input_path)
        return np.asarray(self.forward(x)[layer][0])

    def get_layer_dims(self, layer: str = 'conv_feat'
                       ) -> Tuple[int, int, int]:
        """Feature-volume dims (h, w, c) — the darknet `layer_dims`
        capability (models_detection/YOLO.py:136-138)."""
        cfg = self.config
        gh, gw = cfg.image_h // 32, cfg.image_w // 32
        if layer == 'conv_feat':
            return gh, gw, max(1024 // cfg.width_div, 4)
        if layer == 'netout':
            return gh, gw, cfg.num_anchors * (5 + cfg.num_classes)
        raise KeyError(layer)

    def forward_batch(self, images: np.ndarray, layer: str = 'conv_feat',
                      top_k: int = 16):
        """Batched prior-source surface for the tracker data pipeline:
        images (N, H, W, 3) in [0, 1] →
        (feats (N, fh, fw, fc), boxes (N, K, 4) center-format normalized,
        labels (N, K), scores (N, K), valid (N, K)).

        One jitted program for the whole chunk — the vectorized
        replacement for the reference's per-frame darknet call from
        inside the generator (preprocessing.py:418)."""
        cfg = self.config
        out = self.forward(jnp.asarray(images, jnp.float32))
        dec = jax.vmap(lambda n: decode_and_nms(
            n, jnp.asarray(cfg.anchors), obj_threshold=cfg.obj_threshold,
            nms_threshold=cfg.nms_threshold, top_k=top_k))(out['netout'])
        boxes, labels, scores, valid = dec
        return out[layer], boxes, labels, scores, valid

    def extract_spatio_info(self, file_path: str, layer: str = 'conv_feat',
                            class_filter: Optional[Sequence[str]] = None):
        """Detections + feature volume in one forward — the frozen-detector
        surface the single-object data pipeline consumes
        (models_detection/YOLO.py:172-180, preprocessing.py:418)."""
        cfg = self.config
        _, x = self._prep(file_path)
        out = self.forward(x)
        dets = boxes_to_list(*decode_and_nms(
            out['netout'][0], jnp.asarray(cfg.anchors),
            obj_threshold=cfg.obj_threshold,
            nms_threshold=cfg.nms_threshold))
        named = [(cfg.labels[l].lower(), s, b) for l, s, b in dets]
        if class_filter is not None:
            allowed = {c.lower() for c in class_filter}
            named = [d for d in named if d[0] in allowed]
        return named, np.asarray(out[layer][0])
