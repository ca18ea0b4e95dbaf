"""Deterministic fake prior source for hermetic tests.

The reference's single-object pipeline can only be exercised against a
built libdarknet.so or a compiled Caffe (SURVEY.md §4: zero tests).
Here the frozen-detector boundary is a small protocol —
`get_layer_dims(layer)` + `forward_batch(images, layer)` — and this fake
implements it with analytically-derived outputs: features are a fixed
function of the mean pixel, detections are one centered box per image.
Tests of TrackerSequenceBatches / TinyTracker training run with zero
native deps and full determinism.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class FakeDetector:
    def __init__(self, feat_shape: Tuple[int, int, int] = (4, 4, 8),
                 num_labels: int = 4, label_id: int = 0,
                 box=(0.5, 0.5, 0.4, 0.4), top_k: int = 16):
        self.feat_shape = feat_shape
        self.num_labels = num_labels
        self.label_id = label_id
        self.box = np.asarray(box, np.float32)
        self.top_k = top_k

    def get_layer_dims(self, layer: str = 'conv_feat'):
        return self.feat_shape

    def forward_batch(self, images: np.ndarray, layer: str = 'conv_feat',
                      top_k: int = None):
        n = images.shape[0]
        k = top_k or self.top_k
        mean = images.reshape(n, -1).mean(axis=1)
        feats = np.ones((n,) + self.feat_shape, np.float32) \
            * mean[:, None, None, None]
        boxes = np.zeros((n, k, 4), np.float32)
        boxes[:, 0] = self.box
        labels = np.full((n, k), self.label_id, np.int32)
        scores = np.zeros((n, k), np.float32)
        scores[:, 0] = 0.9
        valid = np.zeros((n, k), bool)
        valid[:, 0] = True
        return feats, boxes, labels, scores, valid
