"""Data layer: annotation parsing, dataset converters, sequence windowing,
jittable augmentation, and batch generators.

Host side stays numpy + cv2 (decode/resize); every transform that touches
training math (augmentation geometry, target encoding) is a jittable JAX
op keyed by explicit PRNG, so the device path is deterministic and
fuseable. Reference: /root/reference/utility/ (preprocessing.py,
tb_to_pascal.py, motd_to_pascal.py, utils.py:7-50).
"""

from object_tracking_tpu.data.voc import (  # noqa: F401
    Annotation, ObjectAnnotation, parse_annotation, parse_annotation_dir,
)
from object_tracking_tpu.data.windows import make_sequence_windows  # noqa: F401
from object_tracking_tpu.data.augment import (  # noqa: F401
    augment_frame, augment_sequence, AugmentConfig,
)
from object_tracking_tpu.data.generators import (  # noqa: F401
    DetectionBatches, SequenceBatches, TrackerSequenceBatches,
)
from object_tracking_tpu.data.converters import (  # noqa: F401
    mot_to_voc, visualtb_to_voc,
)
from object_tracking_tpu.data import native_loader  # noqa: F401
