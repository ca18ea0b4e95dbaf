"""Training layer: functional train state, sharded steps, fit loop,
callbacks, orbax checkpointing.

Replaces the reference's Keras callback stack
(/root/reference/models_tracking/BaseTracker.py:71-112 — ModelCheckpoint,
EarlyStopping(10), ReduceLROnPlateau(0.5, 5), TensorBoard;
MultiObjDetTracker.py:247-288 — checkpoint-per-epoch, filename-embedded
resume) with explicit, testable components: a `TrainState` pytree, pjit
train steps over the framework mesh, orbax step-metadata checkpoints
(no filename parsing), and scalar logging to TensorBoard + JSONL.
"""

from object_tracking_tpu.training.state import TrainState, make_optimizer  # noqa: F401
from object_tracking_tpu.training.steps import (  # noqa: F401
    make_joint_train_step, make_joint_eval_step,
    make_joint_train_step_fused, make_joint_eval_step_fused,
    make_tiny_train_step, make_tiny_eval_step,
    make_detector_train_step, make_multihead_detector_train_step,
)
from object_tracking_tpu.training.callbacks import (  # noqa: F401
    EarlyStopping, ReduceLROnPlateau,
)
from object_tracking_tpu.training.checkpoint import CheckpointManager  # noqa: F401
from object_tracking_tpu.training.loop import fit  # noqa: F401
from object_tracking_tpu.training.metrics import MetricLogger  # noqa: F401
