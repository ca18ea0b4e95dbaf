"""Synthetic moving-box dataset: hermetic end-to-end training/testing.

The reference cannot run without MOT17/VisualTB downloads plus built
native detectors; there is no smoke-test path (SURVEY.md §4). This module
fabricates videos of a square moving on a textured background, written as
real JPEGs + PASCAL-VOC XML (trackid included), so every pipeline —
converters excepted — runs end-to-end with zero external data.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Sequence, Tuple

import numpy as np

from object_tracking_tpu.data.voc import Annotation, ObjectAnnotation


# Per-class-index appearance (BGR fill, shape) — classes must be visually
# separable for any detector to learn them; the reference's synthetic
# story is "download MOT17", which has no offline equivalent.
_CLASS_STYLES = (
    ((0, 200, 255), 'square'), ((255, 120, 0), 'circle'),
    ((60, 220, 60), 'square'), ((200, 60, 200), 'circle'),
)


def _draw_object(img, x, y, bw, bh, class_idx: int) -> None:
    import cv2
    color, shape = _CLASS_STYLES[class_idx % len(_CLASS_STYLES)]
    if shape == 'circle':
        cv2.ellipse(img, (x + bw // 2, y + bh // 2), (bw // 2, bh // 2),
                    0, 0, 360, color, -1)
    else:
        img[y:y + bh, x:x + bw] = color


def make_synthetic_dataset(root: str, *, num_videos: int = 2,
                           frames_per_video: int = 8,
                           image_size: Tuple[int, int] = (416, 416),
                           labels: Sequence[str] = ('1',),
                           box_frac: float = 0.3, seed: int = 0,
                           size_jitter: float = 0.0
                           ) -> Tuple[str, str]:
    """Write JPEG frames + VOC XMLs; returns (image_dir, annot_dir).

    Each class index renders with a distinct fill color/shape so
    multi-class detectors can actually be trained on this data;
    `size_jitter` varies the per-video box scale by up to ±that fraction
    of `box_frac` (0 keeps the legacy fixed size).
    """
    import cv2
    rng = np.random.RandomState(seed)
    w, h = image_size
    image_dir = os.path.join(root, 'images')
    annot_dir = os.path.join(root, 'annotations')
    for v in range(num_videos):
        folder = f'video_{v:02d}'
        os.makedirs(os.path.join(image_dir, folder), exist_ok=True)
        os.makedirs(os.path.join(annot_dir, folder), exist_ok=True)
        frac = box_frac
        if size_jitter:
            frac *= 1.0 + rng.uniform(-size_jitter, size_jitter)
        bw, bh = max(int(w * frac), 4), max(int(h * frac), 4)
        x = rng.randint(0, w - bw)
        y = rng.randint(0, h - bh)
        vx, vy = rng.randint(-8, 9, size=2)
        bg = rng.randint(0, 80, size=(h, w, 3), dtype=np.uint8)
        class_idx = v % len(labels)
        label = labels[class_idx]
        for f in range(frames_per_video):
            x = int(np.clip(x + vx, 0, w - bw))
            y = int(np.clip(y + vy, 0, h - bh))
            img = bg.copy()
            _draw_object(img, x, y, bw, bh, class_idx)
            fname = f'{f:04d}.jpg'
            cv2.imwrite(os.path.join(image_dir, folder, fname), img)
            _write_xml(os.path.join(annot_dir, folder, f'{f:04d}.xml'),
                       folder, fname, w, h, label, v,
                       (x, y, x + bw, y + bh))
    return image_dir, annot_dir


def _write_xml(path, folder, filename, width, height, label, trackid,
               box) -> None:
    ann = ET.Element('annotation')
    ET.SubElement(ann, 'folder').text = folder
    ET.SubElement(ann, 'filename').text = filename
    size = ET.SubElement(ann, 'size')
    ET.SubElement(size, 'width').text = str(width)
    ET.SubElement(size, 'height').text = str(height)
    obj = ET.SubElement(ann, 'object')
    ET.SubElement(obj, 'name').text = str(label)
    ET.SubElement(obj, 'trackid').text = str(trackid)
    bb = ET.SubElement(obj, 'bndbox')
    for k, v in zip(('xmin', 'ymin', 'xmax', 'ymax'), box):
        ET.SubElement(bb, k).text = str(v)
    ET.ElementTree(ann).write(path)


def make_synthetic_annotations(num_videos: int = 2,
                               frames_per_video: int = 8,
                               image_size: Tuple[int, int] = (64, 64),
                               labels: Sequence[str] = ('1',),
                               seed: int = 0) -> List[Annotation]:
    """In-memory annotations (no files) for pure-logic tests."""
    rng = np.random.RandomState(seed)
    w, h = image_size
    anns = []
    for v in range(num_videos):
        folder = f'video_{v:02d}'
        bw, bh = w // 4, h // 4
        x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
        for f in range(frames_per_video):
            anns.append(Annotation(
                filename=f'{folder}/{f:04d}.jpg', folder=folder,
                width=w, height=h,
                objects=[ObjectAnnotation(
                    labels[v % len(labels)], x, y, x + bw, y + bh,
                    trackid=v)]))
    return anns
