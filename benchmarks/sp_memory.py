"""Sequence parallelism's memory claim, measured (VERDICT r4 #3).

`parallel/context.py` exists to divide per-device activation memory by
`time_shards`; round 4 shipped the mechanism exactness-tested but the
benefit unmeasured. This harness records it from the XLA compiler's own
memory accounting on the real chip:

- For each clip length T, the dense joint train step (416²,
  ConvLSTM-512, B=1, remat off) is AOT-compiled (`.lower().compile()`)
  and its `memory_analysis()` — temp (activation) + argument + output
  bytes — is recorded WITHOUT running it, so clip lengths far past HBM
  can be tabulated instead of crashing.
- The k-way SP column is the same step compiled at T_local = T/k: the
  ring scan materializes exactly one shard's activations per device
  (plus an O(1) carried state per round — measured too small to show at
  this scale), so the per-device program of k-way SP over global T IS
  the dense program at T/k up to the ppermute buffers.
- One configuration is cross-checked against the runtime's
  `device_memory_stats` peak after an actual step, anchoring the
  compiler numbers to execution truth.

Output: one JSON line; --record writes benchmarks/SP_MEMORY.json, which
tests/test_parallel.py pins the scaling law against.

Usage: python benchmarks/sp_memory.py [--sizes 4,8,16,32,64] [--record]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HBM_BYTES_V5E = 16 * 1024 ** 3          # v5e: 16 GiB HBM per chip


def compiled_memory(t: int, size: int = 416, check_runtime: bool = False,
                    remat: bool = False) -> dict:
    """AOT-compile the dense joint train step at clip length `t` and
    return the compiler's memory accounting (bytes). `remat=True`
    rematerializes the per-frame detector in backward
    (JointConfig.remat → jax.checkpoint) — the FLOPs-for-HBM lever that
    composes with sequence parallelism."""
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.config import (
        JointConfig, LossConfig, YOLOV2_ANCHORS)
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.training import (
        TrainState, make_joint_train_step, make_optimizer)

    gh = gw = size // 32
    c, a = 12, 5
    model = MultiObjDetTracker(num_classes=c, num_anchors=a,
                               convlstm_features=512, dtype=jnp.bfloat16,
                               remat=remat)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 64, 64, 3)))
    state = TrainState.create(model.apply, variables,
                              make_optimizer(1e-4))
    step = make_joint_train_step(YOLOV2_ANCHORS, LossConfig(),
                                 JointConfig())
    batch = {
        'images': np.zeros((1, t, size, size, 3), np.float32),
        'y_true': np.zeros((1, t, gh, gw, a, 5 + c), np.float32),
        'true_boxes': np.zeros((1, t, 1, 1, 1, 50, 4), np.float32),
    }
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    out = {'t': t,
           'temp_bytes': int(getattr(m, 'temp_size_in_bytes', 0)),
           'arg_bytes': int(getattr(m, 'argument_size_in_bytes', 0)),
           'out_bytes': int(getattr(m, 'output_size_in_bytes', 0)),
           'alias_bytes': int(getattr(m, 'alias_size_in_bytes', 0))}
    # peak ≈ args + outputs + temps − donated aliases (state is donated)
    out['total_bytes'] = (out['temp_bytes'] + out['arg_bytes']
                          + out['out_bytes'] - out['alias_bytes'])
    if check_runtime:
        from object_tracking_tpu.utils.profiling import (
            device_memory_stats)
        sb = jax.device_put(batch)
        state2, metrics = step(state, sb)
        float(np.asarray(metrics['loss']))          # fence
        stats = device_memory_stats()[0]
        out['runtime_peak_bytes'] = int(stats.get('peak_bytes_in_use', 0))
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument('--sizes', default='4,8,16,32,64,96')
    p.add_argument('--size', type=int, default=416)
    p.add_argument('--shards', default='2,4,8')
    p.add_argument('--check-runtime-t', type=int, default=8,
                   help='T at which to cross-check against the runtime '
                        'peak (0 disables)')
    p.add_argument('--remat', action='store_true',
                   help='measure with the detector rematerialized in '
                        'backward (jax.checkpoint) — the other HBM '
                        'lever; recorded under a "remat" key')
    p.add_argument('--record', action='store_true')
    a = p.parse_args()

    from object_tracking_tpu.utils import enable_compile_cache
    enable_compile_cache(os.path.join(ROOT, '.jax_cache'))

    ts = [int(x) for x in a.sizes.split(',')]
    shards = [int(x) for x in a.shards.split(',')]
    rows = {}
    t0 = time.perf_counter()
    for t in ts:
        try:
            rows[t] = compiled_memory(
                t, a.size, check_runtime=(t == a.check_runtime_t),
                remat=a.remat)
        except Exception as e:  # RESOURCE_EXHAUSTED at extreme T
            rows[t] = {'t': t, 'error': str(e)[:200]}
        got = rows[t].get('total_bytes')
        print(f'[sp_memory +{time.perf_counter() - t0:5.0f}s] T={t}: '
              + (f'{got / 1e9:.2f} GB'
                 if got else rows[t].get('error', '?')),
              file=sys.stderr, flush=True)

    # Dense-vs-SP table: k-way SP's per-device program is dense at T/k.
    table = []
    for t in ts:
        r = rows.get(t, {})
        entry = {'t': t,
                 'dense_gb': round(r.get('total_bytes', 0) / 1e9, 3),
                 'dense_fits': bool(
                     r.get('total_bytes', 1 << 62) < HBM_BYTES_V5E)}
        for k in shards:
            if t % k == 0 and (t // k) in rows and \
                    'total_bytes' in rows[t // k]:
                entry[f'sp{k}_gb_per_device'] = round(
                    rows[t // k]['total_bytes'] / 1e9, 3)
        table.append(entry)

    out = {'size': a.size, 'remat': bool(a.remat),
           'hbm_gb': round(HBM_BYTES_V5E / 1e9, 1),
           'rows': table,
           'runtime_check': {
               't': a.check_runtime_t,
               'compiled_gb': round(rows.get(a.check_runtime_t, {})
                                    .get('total_bytes', 0) / 1e9, 3),
               'runtime_peak_gb': round(
                   rows.get(a.check_runtime_t, {})
                   .get('runtime_peak_bytes', 0) / 1e9, 3)},
           'date': time.strftime('%Y-%m-%d')}
    print(json.dumps(out), flush=True)
    if a.record:
        name = 'SP_MEMORY_REMAT.json' if a.remat else 'SP_MEMORY.json'
        with open(os.path.join(ROOT, 'benchmarks', name), 'w') as f:
            json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
