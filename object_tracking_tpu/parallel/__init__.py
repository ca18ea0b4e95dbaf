"""Parallelism layer: one `jax.sharding.Mesh` for everything.

The reference's entire multi-device story is pinning two processes to two
GPUs via env vars (/root/reference/models_tracking/BaseTracker.py:40-48,
models_detection/YOLO.py:130-131, FasterRCNN.py:52-57). The TPU-native
equivalent is a named device mesh with pjit-partitioned programs: batch
sharded over the `data` axis, params replicated (or sharded over `model`),
gradients psum-reduced over ICI — plus a context-parallel scan for long
clips (SURVEY.md §5 'long-context').
"""

from object_tracking_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, distributed_init, replicated_sharding,
    shard_batch, local_batch_size,
)
from object_tracking_tpu.parallel.context import (  # noqa: F401
    context_parallel_scan,
)
from object_tracking_tpu.parallel.sharding import (  # noqa: F401
    plan_tp_specs, shard_variables, tp_sharding_summary,
)
from object_tracking_tpu.parallel.pipeline import (  # noqa: F401
    gpipe, pipeline_scan,
)
from object_tracking_tpu.parallel.expert import (  # noqa: F401
    expert_parallel_moe, init_moe_params, moe_apply, moe_capacity,
)
