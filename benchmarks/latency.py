"""Serving latency/SLO table for the joint clip program.

Throughput already has its story (benchmarks/RESULTS.md: B=32 saturates
the chip at 0.703 MFU). This measures the OTHER axis a serving
deployment plans against: how long one window's result takes.

Two latencies are reported per clip-batch size, because they bound the
two serving regimes:

- **pipelined** — steady-state per-window service time when requests
  are enqueued back-to-back (the device pipeline stays full). Derived
  from chained pull-fenced throughput: ``B / rate``. This is the
  latency a saturated server adds per window.
- **isolated** — wall time for ONE request with an idle pipeline:
  dispatch + device execution + the device->host pull of the decoded
  tracks. On this host every call crosses the axon tunnel, so the
  distribution includes one tunnel RTT (tens of ms, hour-varying); the
  RTT is measured separately and reported so a production-host number
  (DMA, ~10 us host boundary) can be projected as
  ``isolated_p50 - rtt_p50``.

Percentiles (p50/p90/p99) are over individual isolated calls — the
pull IS the fence, so each sample is a true request round trip.

Writes benchmarks/LATENCY.json and prints one JSON line per row.

Reference anchor: the reference serves predictions via
MultiObjDetTracker.predict (MultiObjDetTracker.py:295-315) — per-frame
Keras forward + host decode, no batching, no latency accounting at all.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from benchmarks._timing import pay_d2h_setup, pull_fence, pull_rtt, timeit  # noqa: E402


def _percentiles(xs):
    import numpy as np
    a = np.sort(np.asarray(xs))
    def pct(p):
        return float(a[min(len(a) - 1, int(round(p / 100 * (len(a) - 1))))])
    return {'p50': pct(50), 'p90': pct(90), 'p99': pct(99)}


def bench_latency(batches, iters: int, isolated_calls: int, t: int = 4,
                  num_classes: int = 12):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.config import YOLOV2_ANCHORS
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.ops.decode import decode_and_nms

    model = MultiObjDetTracker(num_classes=num_classes, num_anchors=5,
                               convlstm_features=512, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, t, 416, 416, 3)))
    anchors = jnp.asarray(YOLOV2_ANCHORS)

    @jax.jit
    def run(v, frames_u8):
        x = frames_u8.astype(jnp.float32) / 255.0
        track = model.apply(v, x, train=False)['track']
        return jax.vmap(jax.vmap(lambda n: decode_and_nms(n, anchors)))(
            track)

    rng = np.random.RandomState(0)
    rows = []
    for b in batches:
        clip = jax.device_put(
            (rng.rand(b, t, 416, 416, 3) * 255).astype(np.uint8))
        # steady-state: chained iterations, one fencing pull
        dt = timeit(lambda: run(variables, clip), iters)
        pipelined_ms = dt / b * 1e3          # per-window service time
        # isolated: each call individually pull-fenced (idle pipeline
        # between samples — the pull itself drains it)
        samples = []
        for _ in range(isolated_calls):
            t0 = time.perf_counter()
            pull_fence(run(variables, clip))
            samples.append((time.perf_counter() - t0) * 1e3)
        iso = _percentiles(samples)
        row = {'batch': b, 't': t,
               'pipelined_ms_per_window': round(pipelined_ms, 3),
               'isolated_ms': {k: round(v, 1) for k, v in iso.items()},
               'fps': round(b * t / dt, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--isolated-calls', type=int, default=60)
    ap.add_argument('--batches', default='1,8,32')
    args = ap.parse_args()
    import datetime
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(_HERE), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    pay_d2h_setup(log=lambda m: print(m, file=sys.stderr, flush=True))
    rtt_ms = pull_rtt() * 1e3
    rows = bench_latency([int(b) for b in args.batches.split(',')],
                         args.iters, args.isolated_calls)
    out = {'date': datetime.date.today().isoformat(),
           'platform': jax.devices()[0].platform,
           'tunnel_rtt_ms': round(rtt_ms, 1),
           'note': ('isolated_ms includes one axon-tunnel RTT; '
                    'production-host projection = isolated - rtt'),
           'rows': rows}
    with open(os.path.join(_HERE, 'LATENCY.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps({'tunnel_rtt_ms': round(rtt_ms, 1),
                      'written': 'benchmarks/LATENCY.json'}), flush=True)


if __name__ == '__main__':
    main()
