"""Profiling & tracing: the TPU-native observability subsystem.

The reference's only introspection is Keras TensorBoard graph writing and
`model.summary()` prints (SURVEY.md §5: /root/reference/models_tracking/
BaseTracker.py:96-102, MultiObjDetTracker.py:269-272). Here profiling is
first-class and XLA-aware:

- `profile_trace(log_dir)`: context manager around `jax.profiler` — the
  resulting trace opens in TensorBoard's profile plugin / Perfetto with
  per-op device timelines, fusion boundaries, and HBM traffic;
- `annotate(name)`: names a region so host spans and device ops group
  under it in the trace (`jax.profiler.TraceAnnotation`);
- `StepTimer`: wall-clock steps/sec + examples/sec with compile-step
  exclusion (first-step compile is ~20-40s on TPU and would corrupt any
  mean);
- `device_memory_stats()`: per-device HBM usage where the backend
  exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str,
                  create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device+host profiler trace into `log_dir`."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (context manager): host span + device ops grouped
    under `name` in the profile."""
    return jax.profiler.TraceAnnotation(name)


def enable_compile_cache(cache_dir: str) -> None:
    """Point jax's persistent compilation cache at `cache_dir`.

    Over the axon tunnel a 416-squared train-step compile costs minutes
    of wall clock; with the cache, every run after the first skips it.
    Called by the trainer CLI and the benchmark harnesses — NOT on
    library import (a library must not mutate global jax config as an
    import side effect)."""
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)


def device_memory_stats() -> List[Dict[str, float]]:
    """Per-device memory stats (bytes). Empty dicts where the backend
    doesn't expose them (e.g. CPU)."""
    stats = []
    for d in jax.local_devices():
        try:
            stats.append(dict(d.memory_stats() or {}))
        except Exception:
            stats.append({})
    return stats


class StepTimer:
    """Throughput meter that ignores the first (compile) step.

    >>> timer = StepTimer(batch_size=8)
    >>> for batch in batches:
    ...     state, _ = step(state, batch)
    ...     timer.tick()
    >>> timer.steps_per_sec(), timer.examples_per_sec()
    """

    def __init__(self, batch_size: int = 1, skip_first: int = 1):
        self.batch_size = batch_size
        self.skip_first = skip_first
        self._count = 0
        self._t0: Optional[float] = None
        self._timed_steps = 0

    def tick(self) -> None:
        self._count += 1
        if self._count == self.skip_first:
            self._t0 = time.perf_counter()
        elif self._count > self.skip_first:
            self._timed_steps += 1

    def elapsed(self) -> float:
        if self._t0 is None:
            return 0.0
        return time.perf_counter() - self._t0

    def steps_per_sec(self) -> float:
        dt = self.elapsed()
        return self._timed_steps / dt if dt > 0 else 0.0

    def examples_per_sec(self) -> float:
        return self.steps_per_sec() * self.batch_size
