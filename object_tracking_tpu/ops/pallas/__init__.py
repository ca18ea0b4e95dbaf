"""Pallas TPU kernels for ops where XLA fusion leaves time on the table
(SURVEY.md §7.8 — written measured-first, enabled where benchmarks win).

Every kernel has a pure-JAX reference implementation in `ops/` and an
equality test; kernels run in interpreter mode on CPU so the suite stays
hermetic."""

from object_tracking_tpu.ops.pallas.decode_nms_pallas import (  # noqa: F401
    decode_nms_fused,
)
from object_tracking_tpu.ops.pallas.nms_pallas import (  # noqa: F401
    nms_scores_pallas,
)
