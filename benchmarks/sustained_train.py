"""Sustained end-to-end training throughput (VERDICT r4 #1).

The per-step tables always looked great while real training runs kept
the chip nearly idle: the 416² stability run sustained ~4.9 fps against
a ~549 img/s isolated detector step rate (~1%), because the legacy host
data path shipped every augmented image over the host link three times.
This benchmark puts the sustained number ON THE BOARD and measures it
for both data paths, in the exact quality-harness configuration
(train_quality.py scenes, B=4, T=4):

- isolated:   the fused train step's device-resident rate (batch staged
              in HBM once, iterations chained through the carried train
              state, pull-fenced — the bench.py methodology);
- sustained:  wall-clock frames/sec across full epochs of the fit-style
              loop (host decode → [augment/encode] → transfer → step,
              prefetch=2), for the fused uint8 path and the legacy
              float32 round-trip path;
- breakdown:  host decode rate and an estimated host→device shipment
              cost per batch, so a tunnel/1-core-bound residual is
              attributable rather than mysterious.

Usage: python benchmarks/sustained_train.py [--size 160] [--epochs 3]
Prints one JSON line and (with --record) appends to
benchmarks/SUSTAINED.json keyed by size.
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


def _build(size: int, videos: int, frames: int, seed: int = 0):
    """Quality-harness dataset + windows (train_quality.py scenes)."""
    import tempfile

    from object_tracking_tpu.data import (
        make_sequence_windows, parse_annotation_dir)
    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    labels = ('1', '2')
    wd = tempfile.mkdtemp(prefix='ott_sustained_')
    img, ann = make_synthetic_dataset(
        os.path.join(wd, 'train'), num_videos=videos,
        frames_per_video=frames, image_size=(size, size), labels=labels,
        box_frac=0.2, size_jitter=0.35, seed=seed,
        objects_per_video=3, crossing=True, occlusion_frames=2,
        clutter=3)
    anns, _ = parse_annotation_dir(ann, img, labels)
    wins = make_sequence_windows(anns, 4)
    return wins, labels


def run(size: int = 160, epochs: int = 3, videos: int = 24,
        frames: int = 16, batch_size: int = 4, record: bool = False,
        skip_legacy: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.config import Config
    from object_tracking_tpu.data import SequenceBatches
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.parallel import make_mesh, shard_batch
    from object_tracking_tpu.training import (
        TrainState, make_joint_train_step, make_joint_train_step_fused,
        make_optimizer)
    from object_tracking_tpu.training.loop import _prefetch
    from object_tracking_tpu.utils import enable_compile_cache
    enable_compile_cache(os.path.join(ROOT, '.jax_cache_train'))

    cfg = Config()
    labels_cfg = ('1', '2')
    gh = gw = size // 32
    t = 4
    wins, labels = _build(size, videos, frames)
    mesh = make_mesh(cfg.mesh)
    shard = lambda b: shard_batch(mesh, b)                # noqa: E731

    def make_gen(raw):
        return SequenceBatches(
            wins, labels, net_h=size, net_w=size, grid_h=gh, grid_w=gw,
            anchors=cfg.detector.anchors, batch_size=batch_size,
            max_boxes=cfg.train.max_boxes_per_image, augment=True,
            seed=0, raw_mode=raw)

    model = MultiObjDetTracker(
        num_classes=len(labels), num_anchors=cfg.detector.num_anchors,
        convlstm_features=cfg.joint.convlstm_features,
        dtype=jnp.dtype(cfg.joint.compute_dtype))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, t, size, size, 3)))
    cfg.train.grad_clip_norm = 1.0

    def fresh_state():
        # Deep-copy: the steps donate their state, which would delete
        # the shared `variables` buffers after the first run.
        v = jax.tree_util.tree_map(jnp.array, variables)
        return TrainState.create(
            model.apply, v, make_optimizer(2e-4, grad_clip_norm=1.0))

    enc = dict(net_h=size, net_w=size, grid_h=gh, grid_w=gw,
               num_classes=len(labels),
               true_box_buffer=cfg.train.max_boxes_per_image)
    fused_step = make_joint_train_step_fused(
        cfg.detector.anchors, cfg.loss, cfg.joint, augment=True, **enc)
    legacy_step = make_joint_train_step(cfg.detector.anchors, cfg.loss,
                                        cfg.joint)

    gen_raw = make_gen(True)
    steps_per_epoch = len(gen_raw)
    frames_per_epoch = steps_per_epoch * batch_size * t
    out = {'size': size, 'batch_size': batch_size, 't': t,
           'steps_per_epoch': steps_per_epoch,
           'frames_per_epoch': frames_per_epoch}
    log = lambda m: print(f'[sustained] {m}', file=sys.stderr,  # noqa
                          flush=True)

    # ---- host decode rate (the 1-core lower bound) --------------------
    first_raw = next(iter(gen_raw()))
    t0 = time.perf_counter()
    n_dec = 0
    for b in gen_raw():
        n_dec += b['images_u8'].shape[0] * t
        if time.perf_counter() - t0 > 10.0:
            break
    out['host_decode_fps'] = round(n_dec / (time.perf_counter() - t0), 1)
    out['batch_mb_u8'] = round(
        first_raw['images_u8'].nbytes / 1e6, 2)
    log(f'host decode {out["host_decode_fps"]} fps, '
        f'{out["batch_mb_u8"]} MB/batch uint8')

    # ---- isolated step rate (device-resident, pull-fenced) ------------
    # bench.py methodology: steps chain through the carried train state
    # (no overlap possible), one estimating sample then one ~10 s
    # sample, each terminated by a real device→host pull.
    staged = shard(first_raw)
    state = fresh_state()
    state, m = fused_step(state, staged)              # compile
    float(np.asarray(m['loss']))                      # pay d2h setup
    for _ in range(3):                                # warm
        state, m = fused_step(state, staged)
    float(np.asarray(m['loss']))
    log('fused step compiled; timing isolated rate...')
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = fused_step(state, staged)
    float(np.asarray(m['loss']))
    est = 20 / (time.perf_counter() - t0)             # steps/sec
    iters = max(int(est * 10.0), 20)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = fused_step(state, staged)
    float(np.asarray(m['loss']))
    out['isolated_step_fps'] = round(
        iters * batch_size * t / (time.perf_counter() - t0), 1)
    log(f'isolated {out["isolated_step_fps"]} fps ({iters} steps)')

    # ---- host→device shipment rate (the tunnel bound) -----------------
    # Pull-fenced: each put is forced onto the device by summing it in a
    # tiny jitted program chained into one final pulled scalar.
    import jax.numpy as jnp  # noqa: F811  (local for the lambda below)
    touch = jax.jit(lambda x, s: s + x['images_u8'].astype(
        jnp.float32).sum())
    acc = shard(np.float32(0))
    acc = touch(staged, acc)
    float(np.asarray(acc))                            # warm + fence
    n_put = 8
    t0 = time.perf_counter()
    for i in range(n_put):
        fresh = dict(first_raw)
        fresh['images_u8'] = first_raw['images_u8'] ^ np.uint8(i + 1)
        acc = touch(shard(fresh), acc)
    float(np.asarray(acc))
    out['h2d_fps'] = round(
        n_put * batch_size * t / (time.perf_counter() - t0), 1)
    log(f'h2d shipment {out["h2d_fps"]} fps '
        f'({out["batch_mb_u8"]} MB/batch uint8)')

    # ---- sustained epochs, fused path ---------------------------------
    def sustained(step_fn, gen, label):
        st = fresh_state()
        per_epoch = []
        for ep in range(epochs):
            t0 = time.perf_counter()
            m = None
            for b in _prefetch(lambda: (shard(x) for x in gen()), 2):
                st, m = step_fn(st, b)
            float(np.asarray(m['loss']))              # fence the epoch
            dt = time.perf_counter() - t0
            per_epoch.append(frames_per_epoch / dt)
            log(f'{label} epoch {ep + 1}: {dt:.1f}s '
                f'({per_epoch[-1]:.1f} fps)')
        # epoch 1 pays compile; report the rest (or the single epoch)
        timed = per_epoch[1:] or per_epoch
        return round(float(np.mean(timed)), 1)

    out['sustained_fused_fps'] = sustained(fused_step, gen_raw, 'fused')
    if not skip_legacy:
        out['sustained_legacy_fps'] = sustained(
            legacy_step, make_gen(False), 'legacy')
    out['fused_fraction_of_isolated'] = round(
        out['sustained_fused_fps'] / out['isolated_step_fps'], 3)
    print(json.dumps(out), flush=True)
    if record:
        path = os.path.join(ROOT, 'benchmarks', 'SUSTAINED.json')
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        # merge: a --skip-legacy re-run must not drop the recorded
        # legacy row from an earlier full run
        data[str(size)] = {**data.get(str(size), {}), **out}
        data['date'] = os.environ.get('OTT_BENCH_DATE', time.strftime(
            '%Y-%m-%d'))
        with open(path, 'w') as f:
            json.dump(data, f, indent=1)
    return out


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--size', type=int, default=160)
    p.add_argument('--epochs', type=int, default=3)
    p.add_argument('--videos', type=int, default=24)
    p.add_argument('--frames', type=int, default=16)
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--skip-legacy', action='store_true')
    p.add_argument('--record', action='store_true')
    a = p.parse_args()
    run(size=a.size, epochs=a.epochs, videos=a.videos, frames=a.frames,
        batch_size=a.batch_size, record=a.record,
        skip_legacy=a.skip_legacy)
