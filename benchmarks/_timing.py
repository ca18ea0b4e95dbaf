"""Truthful timing over the axon TPU tunnel.

Hard-won facts (2026-08-20, see also bench.py docstring):
- `jax.block_until_ready` returns BEFORE remote execution completes on
  the axon platform; block-fenced loops measure dispatch rate (observed
  ~2x over chip peak). The only real fence is an actual device->host
  pull. Remote execution is FIFO per device, so pulling any leaf of the
  LAST output fences every execution enqueued before it (verified:
  chained-salt and unchained loops time identically under a final pull).
- The first d2h transfer of a process costs a one-time 85-440 s tunnel
  setup; pay it once up front via `pay_d2h_setup()`.
- A pull costs one tunnel RTT (tens of ms, varies by the hour). timeit()
  measures the RTT separately, sizes the loop so the op work dominates
  it, and subtracts it from the sample.
"""

from __future__ import annotations

import time

_RTT: float | None = None


def pay_d2h_setup(log=None) -> float:
    """Pull 8 bytes to pay the process's one-time d2h setup; returns
    the seconds it took (one plain RTT when already paid)."""
    import jax.numpy as jnp
    import numpy as np
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(1))
    dt = time.perf_counter() - t0
    if log:
        log(f'd2h setup: {dt:.1f}s')
    return dt


def pull_fence(out) -> None:
    """Fence by pulling one leaf of `out` to host (FIFO ordering makes
    this fence everything enqueued before it)."""
    import numpy as np
    from jax import tree_util
    leaves = tree_util.tree_leaves(out)
    np.asarray(leaves[0]).ravel()[:1]


def pull_rtt(refresh: bool = False) -> float:
    """Best-of-5 round-trip time of pulling a tiny staged device buffer
    (pure d2h; the buffer is already materialized)."""
    global _RTT
    if _RTT is not None and not refresh:
        return _RTT
    import jax
    import numpy as np
    ts = []
    for _ in range(5):
        a = jax.device_put(np.zeros(8, np.float32))
        t0 = time.perf_counter()
        np.asarray(a)
        ts.append(time.perf_counter() - t0)
    _RTT = min(ts)
    return _RTT


def timeit(fn, iters: int, target_secs: float = 1.0) -> float:
    """Seconds per call, compile excluded, pull-fenced.

    Grows the iteration count until the sample is long enough that the
    single fencing pull's RTT is noise (>= max(target_secs, 25x RTT)),
    then subtracts that RTT. Floor: ops cheaper than the tunnel's
    per-call dispatch (~35-130 us) read as dispatch rate — the tunnel
    cannot resolve below that from a host loop.
    """
    pull_fence(fn())                       # compile + warm fence
    rtt = pull_rtt()
    floor = max(target_secs, 25.0 * rtt)
    n = max(iters, 1)
    while True:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        pull_fence(out)
        dt = time.perf_counter() - t0
        if dt >= floor or n >= 1_000_000:
            break
        scale = floor / max(dt, 1e-9)
        n = max(int(n * min(scale * 1.3, 100.0)), n * 2)
    return max(dt - rtt, 1e-9) / n
