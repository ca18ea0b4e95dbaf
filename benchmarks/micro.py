"""Micro-benchmarks justifying the framework's kernel/design choices.

Run on the real TPU (no JAX_PLATFORMS override):

    python benchmarks/micro.py [--iters N]

Measures, printing one JSON line per benchmark:
- NMS: sort-walk vs one-hot-matmul vs Pallas kernel (K=128 candidates);
- decode+NMS fused pipeline per frame;
- ConvLSTM: naive per-step dual-conv (flax ConvLSTMCell under nn.RNN) vs
  FusedConvLSTM (input conv MXU-batched over B*T);
- native C++ image loader vs cv2 per-image Python loop (host-side).

SURVEY.md §7.8 stance: Pallas and hand formulations are adopted only
where these numbers win.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


sys.path.insert(0, __file__.rsplit('/', 1)[0])

from _timing import pay_d2h_setup, pull_fence, timeit as _timeit  # noqa: E402


def bench_nms(iters: int):
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.ops.nms import greedy_nms_scores
    from object_tracking_tpu.ops.pallas import nms_scores_pallas

    rng = np.random.RandomState(0)
    k, c = 128, 12
    boxes = jnp.asarray(np.stack(
        [rng.uniform(0.2, 0.8, k), rng.uniform(0.2, 0.8, k),
         rng.uniform(0.05, 0.4, k), rng.uniform(0.05, 0.4, k)],
        -1).astype(np.float32))
    scores = rng.rand(k, c).astype(np.float32)
    scores[scores < 0.5] = 0.0
    scores = jnp.asarray(scores)

    out = {}
    for name, fn in [
        ('nms_sort', lambda: greedy_nms_scores(boxes, scores, 0.45,
                                               top_k=0, impl='sort')[1]),
        ('nms_matmul', lambda: greedy_nms_scores(boxes, scores, 0.45,
                                                 top_k=0,
                                                 impl='matmul')[1]),
        ('nms_pallas', lambda: nms_scores_pallas(boxes, scores, 0.45)),
    ]:
        dt = _timeit(fn, iters)
        out[name] = dt
        print(json.dumps({'bench': name, 'us': round(dt * 1e6, 1),
                          'k': k, 'classes': c}))
    return out


def bench_decode(iters: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.config import YOLOV2_ANCHORS
    from object_tracking_tpu.ops.decode import decode_and_nms

    rng = np.random.RandomState(0)
    netout = jnp.asarray(rng.randn(13, 13, 5, 85).astype(np.float32))
    anchors = jnp.asarray(YOLOV2_ANCHORS)
    fn = jax.jit(lambda n: decode_and_nms(n, anchors))
    dt = _timeit(lambda: fn(netout), iters)
    print(json.dumps({'bench': 'decode_and_nms_13x13x5x85',
                      'us': round(dt * 1e6, 1)}))


def bench_convlstm(iters: int):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.models.convlstm import FusedConvLSTM

    rng = np.random.RandomState(0)
    b, t, h, w, cin, f = 1, 4, 13, 13, 1024, 512
    x = jnp.asarray(rng.rand(b, t, h, w, cin).astype(np.float32))

    class NaiveWrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            cell = nn.ConvLSTMCell(f, (3, 3))
            return nn.RNN(cell)(x)

    for name, model in [('convlstm_naive_rnn', NaiveWrap()),
                        ('convlstm_fused', FusedConvLSTM(f, (3, 3)))]:
        variables = model.init(jax.random.PRNGKey(0), x)
        fn = jax.jit(lambda v, xx, m=model: m.apply(v, xx))
        dt = _timeit(lambda: fn(variables, x), iters)
        print(json.dumps({'bench': name, 'ms': round(dt * 1e3, 2),
                          'shape': [b, t, h, w, cin], 'features': f}))


def bench_matcher(iters: int):
    """Track-identity assignment for a T=16 window: in-jit greedy
    (ops/matching.assign_tracks under lax.scan, one device program) vs
    the host path (per-frame device→host pull + scipy Hungarian in
    TrackManager). Justifies JointPredictor's matcher='greedy' default."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.ops.matching import (
        TrackManager, assign_tracks, init_track_state)

    t, k = 16, 32
    rng = np.random.RandomState(0)
    centers = rng.uniform(0.2, 0.8, (8, 2))
    boxes = np.zeros((t, k, 4), np.float32)
    labels = np.zeros((t, k), np.int32)
    valid = np.zeros((t, k), bool)
    for f in range(t):
        centers = np.clip(centers + rng.uniform(-0.02, 0.02, (8, 2)),
                          0, 1)
        for i, c in enumerate(centers):
            boxes[f, i] = (c[0], c[1], 0.12, 0.12)
            labels[f, i] = i % 3
            valid[f, i] = True
    d_boxes, d_labels, d_valid = map(jnp.asarray, (boxes, labels, valid))

    @jax.jit
    def greedy_window(ts, bb, ll, vv):
        def frame(carry, det):
            b, l, v = det
            carry, ids = assign_tracks(carry, b, l, v)
            return carry, ids
        return jax.lax.scan(frame, ts, (bb, ll, vv))

    ts0 = init_track_state(64)
    # pull per call: per-window latency including one dispatch and one
    # ids pull, the honest comparison against the host loop's per-frame
    # pulls (block_until_ready does not fence on axon — see _timing.py)
    pull_fence(greedy_window(ts0, d_boxes, d_labels, d_valid)[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        pull_fence(greedy_window(ts0, d_boxes, d_labels, d_valid)[1])
    dt_greedy = (time.perf_counter() - t0) / iters

    def host_window():
        tm = TrackManager()
        out = []
        for f in range(t):
            # device→host pull per frame, like the pre-greedy predictor
            b = np.asarray(d_boxes[f])
            l = np.asarray(d_labels[f])
            v = np.asarray(d_valid[f])
            out.append(tm.update(b[v], labels=l[v]))
        return out

    host_window()
    t0 = time.perf_counter()
    for _ in range(iters):
        host_window()
    dt_host = (time.perf_counter() - t0) / iters
    print(json.dumps({'bench': 'track_assign_T16_K32',
                      'greedy_in_jit_us': round(dt_greedy * 1e6, 1),
                      'host_hungarian_us': round(dt_host * 1e6, 1),
                      'speedup': round(dt_host / dt_greedy, 2)}))


def bench_loader(iters: int):
    import numpy as np

    from object_tracking_tpu.data import native_loader

    if not native_loader.available():
        print(json.dumps({'bench': 'native_loader', 'skipped': True}))
        return
    import tempfile

    import cv2
    root = tempfile.mkdtemp(prefix='ott_bench_')
    rng = np.random.RandomState(0)
    img = cv2.GaussianBlur(
        rng.randint(0, 255, (720, 1280, 3), np.uint8), (9, 9), 3)
    path = f'{root}/f.jpg'
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 92])
    paths = [path] * 32

    native_loader.load_batch(paths, 416, 416)      # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        native_loader.load_batch(paths, 416, 416)
    native_ms = (time.perf_counter() - t0) / iters * 1e3

    def cv2_batch():
        return np.stack([
            cv2.resize(cv2.imread(p), (416, 416))[:, :, ::-1]
            .astype(np.float32) / 255.0 for p in paths])

    cv2_batch()
    t0 = time.perf_counter()
    for _ in range(iters):
        cv2_batch()
    cv2_ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({'bench': 'loader_32x720p_to_416',
                      'native_ms': round(native_ms, 1),
                      'cv2_ms': round(cv2_ms, 1),
                      'speedup': round(cv2_ms / native_ms, 2)}))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--only', choices=['nms', 'decode', 'convlstm',
                                      'matcher', 'loader'])
    args = p.parse_args()
    if args.only != 'loader':
        import jax
        jax.config.update('jax_compilation_cache_dir',
                          __file__.rsplit('/', 2)[0] + '/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes',
                          -1)
        pay_d2h_setup(log=lambda m: print(m, file=sys.stderr,
                                          flush=True))
    table = {
        'nms': bench_nms, 'decode': bench_decode,
        'convlstm': bench_convlstm, 'matcher': bench_matcher,
        'loader': bench_loader,
    }
    for name, fn in table.items():
        if args.only and name != args.only:
            continue
        fn(args.iters)


if __name__ == '__main__':
    sys.path.insert(0, __file__.rsplit('/', 2)[0])
    main()
