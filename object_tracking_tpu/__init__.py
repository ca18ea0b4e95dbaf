"""object_tracking_tpu — a TPU-native detection-and-tracking framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
ktzsh/object-tracking (reference mounted at /root/reference):

- YOLOv2 / Darknet-19 detector with darknet `.weights` ingestion
  (reference: models_detection/KerasYOLO.py)
- Single-object trackers: TinyTracker (bbox head) and TinyHeatmapTracker
  (occupancy-grid head) over frozen detector features
  (reference: models_tracking/TinyTracker.py, TinyHeatmapTracker.py)
- Joint multi-object detect+track model with a ConvLSTM tracking head
  (reference: models_tracking/MultiObjDetTracker.py)
- PASCAL-VOC / MOT17 / VisualTB / ImageNet-VID data pipeline
  (reference: utility/preprocessing.py, utility/*_to_pascal.py)
- Train loop with checkpoint/early-stop/reduce-on-plateau/TensorBoard
  (reference: models_tracking/BaseTracker.py)

Everything on the compute path is pure-functional JAX: models are flax
modules, recurrence is `jax.lax.scan`, augmentation is jittable and keyed
by explicit PRNG, NMS/decode run on device, and parallelism is one
`jax.sharding.Mesh` (data/model axes) instead of env-var GPU pinning.
"""

__version__ = "0.1.0"

from object_tracking_tpu.config import Config, load_config  # noqa: F401
