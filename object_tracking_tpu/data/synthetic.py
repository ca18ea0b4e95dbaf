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


def make_synthetic_dataset(root: str, *, num_videos: int = 2,
                           frames_per_video: int = 8,
                           image_size: Tuple[int, int] = (416, 416),
                           labels: Sequence[str] = ('1',),
                           box_frac: float = 0.3, seed: int = 0
                           ) -> Tuple[str, str]:
    """Write JPEG frames + VOC XMLs; returns (image_dir, annot_dir)."""
    import cv2
    rng = np.random.RandomState(seed)
    w, h = image_size
    image_dir = os.path.join(root, 'images')
    annot_dir = os.path.join(root, 'annotations')
    bw, bh = int(w * box_frac), int(h * box_frac)
    for v in range(num_videos):
        folder = f'video_{v:02d}'
        os.makedirs(os.path.join(image_dir, folder), exist_ok=True)
        os.makedirs(os.path.join(annot_dir, folder), exist_ok=True)
        x = rng.randint(0, w - bw)
        y = rng.randint(0, h - bh)
        vx, vy = rng.randint(-8, 9, size=2)
        bg = rng.randint(0, 80, size=(h, w, 3), dtype=np.uint8)
        label = labels[v % len(labels)]
        for f in range(frames_per_video):
            x = int(np.clip(x + vx, 0, w - bw))
            y = int(np.clip(y + vy, 0, h - bh))
            img = bg.copy()
            img[y:y + bh, x:x + bw] = (0, 200, 255)
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
