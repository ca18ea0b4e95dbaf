"""Cross-cutting utilities: profiling/tracing, device memory stats."""

from object_tracking_tpu.utils.profiling import (  # noqa: F401
    annotate, device_memory_stats, enable_compile_cache, profile_trace,
    StepTimer,
)
