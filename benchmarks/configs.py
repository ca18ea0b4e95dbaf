"""Per-config benchmarks for the five BASELINE.json workloads.

Run on the real TPU (no JAX_PLATFORMS override):

    python benchmarks/configs.py [--iters N]

Prints one JSON line per config. Where the reference's own execution
model is measurable on this machine (per-frame forward + host decode),
bench.py reports the headline ratio; this file fills in the remaining
BASELINE.json configs with measured TPU numbers at the reference's
workload constants (BASELINE.md):

1. TinyTracker single-object      — LSTM-512, T=4, batch 4, YOLOv2 priors
   (config.json:19-20,29-34). The hot cost in the reference is the
   per-frame darknet call from inside the generator
   (preprocessing.py:418); here priors stream through one jitted
   detector forward, so both phases are measured: prior extraction
   fps and tracker train/infer step time.
2. TinyHeatmapTracker             — heatmap 32x32 head (config.json:21).
3. Standalone YOLOv2 detector     — COCO-80, batch 32 (KerasYOLO.py:52),
   fwd+decode+NMS inference fps and train step fps.
4. MultiObjDetTracker on MOT17    — 12-class, T=4, B=1
   (MultiObjDetTracker.py:83-106): joint fwd+decode fps.
5. MultiObjDetTracker on VID      — 30-class (MultiObjDetTracker.py:108),
   long clip T=16 under the same architecture: joint fwd+decode fps
   (lax.scan recurrence is O(1) memory in T).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import pay_d2h_setup, pull_fence, timeit as _timeit  # noqa: E402


def _report(**kw):
    print(json.dumps(kw))


def bench_tiny(iters: int, heatmap: bool):
    """Configs 1-2: single-object tracker over frozen YOLOv2 priors."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.models import Darknet19, TinyTracker
    from object_tracking_tpu.training import (
        TrainState, make_optimizer, make_tiny_train_step)

    name = 'tiny_heatmap_tracker' if heatmap else 'tiny_tracker'
    b, t = 4, 4                              # config.json:20,29
    out_dim = 32 * 32 if heatmap else 4
    det_dim = 32 * 32 if heatmap else 4
    rng = np.random.RandomState(0)

    # Phase 1 — prior extraction: frames stream uint8 through the jitted
    # bf16 detector; conv_feat is the tracker's input feature volume.
    det = Darknet19(num_classes=80, num_anchors=5, dtype=jnp.bfloat16)
    frames = (rng.rand(b * t, 416, 416, 3) * 255).astype(np.uint8)
    det_vars = det.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 416, 416, 3)))

    @jax.jit
    def extract(v, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        return det.apply(v, x, train=False)['conv_feat']

    feats = extract(det_vars, frames)
    dt = _timeit(lambda: extract(det_vars, frames), iters)
    # Device-resident twin: excludes the per-call uint8 host->device
    # feed, which on this axon tunnel runs at ~45-50 MB/s and dominates
    # (production PCIe/DMA feeds are 2-3 orders faster; BOTH rates are
    # reported so neither bottleneck masquerades as the other).
    frames_dev = jax.device_put(frames)
    dt_dev = _timeit(lambda: extract(det_vars, frames_dev), iters)
    _report(bench=f'{name}_prior_extraction', fps=round(b * t / dt, 1),
            device_resident_fps=round(b * t / dt_dev, 1),
            batch=b * t, note='jitted bf16 Darknet-19 conv_feat, uint8 in'
            ' (replaces per-frame darknet FFI, preprocessing.py:418); '
            'fps = streaming host uint8 over the axon tunnel (h2d-bound)')

    # Phase 2 — tracker train + inference step on the priors.
    fh, fw, fc = feats.shape[1:]
    feats = jnp.asarray(feats, jnp.float32).reshape(b, t, fh, fw, fc)
    batch = {
        'feats': feats,
        'det': jnp.asarray(rng.rand(b, t, det_dim), jnp.float32),
        'target': jnp.asarray(rng.rand(b, t, out_dim), jnp.float32),
    }
    model = TinyTracker(lstm_units=512, out_dim=out_dim)
    variables = model.init(jax.random.PRNGKey(0), batch['feats'],
                           batch['det'])

    # Inference first: the train step donates its state, which aliases
    # (and deletes) these variables' device buffers.
    infer = jax.jit(lambda v, f, d: model.apply(v, f, d))
    dt_inf = _timeit(lambda: infer(variables, batch['feats'],
                                   batch['det']), iters)
    _report(bench=f'{name}_inference', us=round(dt_inf * 1e6, 1),
            fps=round(b * t / dt_inf, 1))

    state = TrainState.create(model.apply, variables,
                              make_optimizer(1e-3))
    step = make_tiny_train_step(heatmap=heatmap)

    # donate_argnums donates the state; rebuild it per timing loop is
    # wrong — instead time the steady-state chain.
    s, m = step(state, batch)                            # compile
    pull_fence(m['loss'])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = step(s, batch)
    pull_fence(m['loss'])
    dt_train = (time.perf_counter() - t0) / iters
    _report(bench=f'{name}_train_step', us=round(dt_train * 1e6, 1),
            sequences_per_sec=round(b / dt_train, 1), batch=b, t=t)


def bench_detector(iters: int):
    """Config 3: standalone YOLOv2, COCO-80, batch 32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.config import YOLOV2_ANCHORS, LossConfig
    from object_tracking_tpu.models import Darknet19
    from object_tracking_tpu.ops.decode import decode_and_nms
    from object_tracking_tpu.training import (
        TrainState, make_optimizer, make_detector_train_step)

    b = 32                                    # KerasYOLO.py:52
    rng = np.random.RandomState(0)
    model = Darknet19(num_classes=80, num_anchors=5, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 416, 416, 3)))
    frames = (rng.rand(b, 416, 416, 3) * 255).astype(np.uint8)

    @jax.jit
    def infer(v, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        netout = model.apply(v, x, train=False)['netout']
        return jax.vmap(lambda n: decode_and_nms(
            n, jnp.asarray(YOLOV2_ANCHORS)))(netout)

    dt = _timeit(lambda: infer(variables, frames), iters)
    frames_dev = jax.device_put(frames)
    dt_dev = _timeit(lambda: infer(variables, frames_dev), iters)
    _report(bench='yolov2_detector_inference', fps=round(b / dt, 1),
            device_resident_fps=round(b / dt_dev, 1),
            batch=b, note='fwd + on-device decode+NMS, bf16, uint8 in; '
            'fps = streaming host uint8 over the axon tunnel (h2d-bound)')

    # Train step (the reference's standalone detector training is broken,
    # SURVEY §4; this is the fixed equivalent).
    fp32 = Darknet19(num_classes=80, num_anchors=5)
    tb = 8                                    # fits one v5e chip fp32+grads
    tvars = fp32.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 416, 416, 3)))
    state = TrainState.create(fp32.apply, tvars, make_optimizer(1e-4))
    step = make_detector_train_step(YOLOV2_ANCHORS, LossConfig())
    batch = {
        'images': jnp.asarray(rng.rand(tb, 416, 416, 3), jnp.float32),
        'y_true': jnp.zeros((tb, 13, 13, 5, 85), jnp.float32),
        'true_boxes': jnp.zeros((tb, 1, 1, 1, 50, 4), jnp.float32),
    }
    s, m = step(state, batch)                            # compile
    pull_fence(m['loss'])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = step(s, batch)
    pull_fence(m['loss'])
    dt_train = (time.perf_counter() - t0) / iters
    _report(bench='yolov2_detector_train_step',
            images_per_sec=round(tb / dt_train, 1), batch=tb,
            note='fp32 params+activations, device-resident batch; the '
            'bf16 twin is benchmarks/mfu.py (548.7 img/s measured)')


def bench_joint(iters: int, num_classes: int, t: int, tag: str):
    """Configs 4-5: joint detect+track forward + decode fps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.config import YOLOV2_ANCHORS
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.ops.decode import decode_and_nms

    rng = np.random.RandomState(0)
    model = MultiObjDetTracker(num_classes=num_classes, num_anchors=5,
                               convlstm_features=512, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, t, 416, 416, 3)))
    clip = (rng.rand(1, t, 416, 416, 3) * 255).astype(np.uint8)

    @jax.jit
    def run(v, frames_u8):
        x = frames_u8.astype(jnp.float32) / 255.0
        track = model.apply(v, x, train=False)['track'][0]
        return jax.vmap(lambda n: decode_and_nms(
            n, jnp.asarray(YOLOV2_ANCHORS)))(track)

    dt = _timeit(lambda: run(variables, clip), iters)
    clip_dev = jax.device_put(clip)
    dt_dev = _timeit(lambda: run(variables, clip_dev), iters)
    _report(bench=f'joint_detect_track_{tag}', fps=round(t / dt, 1),
            device_resident_fps=round(t / dt_dev, 1),
            classes=num_classes, t=t,
            note='fwd + ConvLSTM + on-device decode+NMS, bf16, uint8 in; '
            'fps = streaming host uint8 over the axon tunnel (h2d-bound)')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()
    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    pay_d2h_setup(log=lambda m: print(m, file=sys.stderr, flush=True))
    bench_tiny(args.iters, heatmap=False)      # config 1
    bench_tiny(args.iters, heatmap=True)       # config 2
    bench_detector(args.iters)                 # config 3
    bench_joint(args.iters, 12, 4, 'mot17')    # config 4
    bench_joint(args.iters, 30, 16, 'vid_t16')  # config 5


if __name__ == '__main__':
    main()
