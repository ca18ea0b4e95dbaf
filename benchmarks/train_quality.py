"""Train-to-quality: the joint detect+track model trained until held-out
detection mAP and CLEAR-MOT MOTA clear a stated bar.

The reference's only quality evidence is a checkpoint filename
(val_loss 0.55 at epoch 3, /root/reference/models_tracking/
MultiObjDetTracker.py:106) — it publishes no mAP/MOTA anywhere
(README.md:61 lists benchmarking as an unchecked TODO). This script
produces a real quality row: train `simult_multi_obj_detection_tracking`
on synthetic multi-class video (the only data available offline — the
blocker for MOT17 is recorded in PARITY.md), then run the CLEAR-MOT +
VOC-mAP harness on a held-out val split.

Round-3 default: MULTI-object scenes — 3 simultaneously-visible objects
per frame with crossing trajectories, a 2-frame occlusion per object,
and unannotated distractor clutter (the id-switch stressors of crowded
MOT17 data, utility/motd_to_pascal.py:19-30). `--objects 1` reproduces
the legacy single-object row.

Bar (round-4 ratchet, ~80% of the 160² from-scratch achieved
0.845/0.734; the 416² fine-tuned row reached 0.9025/0.8056):
val mAP >= 0.68 and MOTA > 0.58.

Usage:  python benchmarks/train_quality.py [--epochs 40] [--size 160]
Prints one JSON line: {"map": ..., "mota": ..., "motp": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(epochs: int = 40, size: int = 160, videos: int = 24,
        frames: int = 16, seed: int = 0, workdir: str | None = None,
        batch_size: int = 4, lr: float = 2e-4,
        grad_clip: float = 1.0, warm_up_epochs: int = 2,
        record: bool = False, record_name: str = 'QUALITY.json',
        eval_only: bool = False,
        resume: bool = False, objects: int = 3, crossing: bool = True,
        occlusion=2, clutter: int = 3,
        object_scale_jitter: float = 0.0, camera_pan: float = 0.0,
        window: int = 4,
        bar_map: float = 0.68, bar_mota: float = 0.58,
        transfer_from: str | None = None,
        resume_lr: float | None = None,
        archive_as: str | None = None) -> dict:
    from object_tracking_tpu.config import Config
    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    from object_tracking_tpu.trainer import (
        evaluate_tracking, simult_multi_obj_detection_tracking)
    from object_tracking_tpu.utils import enable_compile_cache
    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache_train'))

    labels = ('1', '2')
    scene = dict(objects_per_video=objects, crossing=crossing,
                 occlusion_frames=occlusion, clutter=clutter,
                 object_scale_jitter=object_scale_jitter,
                 camera_pan=camera_pan)
    wd = workdir or tempfile.mkdtemp(prefix='ott_quality_')
    train_img, train_ann = make_synthetic_dataset(
        os.path.join(wd, 'train'), num_videos=videos,
        frames_per_video=frames, image_size=(size, size), labels=labels,
        box_frac=0.3 if objects == 1 else 0.2, size_jitter=0.35,
        seed=seed, **scene)
    val_img, val_ann = make_synthetic_dataset(
        os.path.join(wd, 'val'), num_videos=6, frames_per_video=frames,
        image_size=(size, size), labels=labels,
        box_frac=0.3 if objects == 1 else 0.2, size_jitter=0.35,
        seed=seed + 991, **scene)

    cfg = Config()
    cfg.joint.labels = labels
    cfg.joint.batch_size = batch_size
    # Training window length (reference: SEQUENCE_LENGTH=4,
    # MultiObjDetTracker.py:101). Longer windows let the ConvLSTM carry
    # tracks across occlusion spans longer than 4 frames — the id-switch
    # lever on the hard scenes; `lax.scan` recurrence is O(1) memory in
    # T so the only cost is compute.
    cfg.joint.sequence_length = window
    cfg.detector.image_h = cfg.detector.image_w = size
    cfg.detector.grid_h = cfg.detector.grid_w = size // 32
    cfg.train.train_image_folder, cfg.train.train_annot_folder = (
        train_img, train_ann)
    cfg.train.val_image_folder, cfg.train.val_annot_folder = (
        val_img, val_ann)
    cfg.train.joint_learning_rate = lr
    # From-scratch YOLO needs both (the reference always fine-tunes from
    # pretrained darknet weights): clip the exploding exp(wh) gradients
    # and pin early boxes to the anchors (warm-up) before free training.
    cfg.train.grad_clip_norm = grad_clip
    steps_per_epoch = max(videos * (frames - window + 1)
                          // batch_size, 1)
    cfg.loss.warm_up_batches = warm_up_epochs * steps_per_epoch
    cfg.train.max_epochs = epochs
    cfg.train.early_stop_patience = max(epochs, 20)  # run the clock out
    cfg.train.augment = True
    # Each save ships the 51M-param state device→host (~12 s over the
    # tunnel); per-epoch saves dominated wall clock once the fused data
    # path made steps fast. Final epoch always saves.
    cfg.train.checkpoint_every_epochs = 5
    # From-scratch training on noisy multi-object val loss: the
    # reference's patience-2 plateau parks lr at min_lr within ~10
    # epochs (measured: two reductions by epoch 9 on the hard scenes),
    # starving the late phase where recall climbs. ~8 epochs of
    # patience keeps the schedule responsive without the collapse.
    cfg.train.joint_reduce_lr_patience = 8
    cfg.train.resume = resume   # pick up an interrupted run's checkpoint
    cfg.train.resume_lr = resume_lr   # fresh rate for cross-res fine-tune

    # eval_only re-runs just the held-out evaluation against whatever
    # checkpoint an earlier (possibly interrupted) training run left in
    # `workdir` — training checkpoints every epoch, so a killed run is
    # still measurable.
    if not eval_only:
        simult_multi_obj_detection_tracking(cfg, workdir=wd)
    results = evaluate_tracking(
        cfg, checkpoint_dir=os.path.join(
            wd, cfg.train.saved_model_dir, 'multi_obj'),
        workdir=wd)
    overall = results['overall']
    per_video = {
        k: {'mota': round(float(r['mota']), 4),
            'id_switches': int(r['id_switches'])}
        for k, r in results.items()
        if k not in ('overall', 'detection')}
    # every pair of crossing objects in a video meets once mid-clip
    crossings_per_video = (objects * (objects - 1) // 2 if crossing
                           else 0)
    out = {'map': round(float(overall['map']), 4),
           'mota': round(float(overall['mota']), 4),
           'motp': round(float(overall['motp']), 4),
           'id_switches': int(overall['id_switches']),
           'epochs': epochs, 'size': size, 'window': window,
           'train_frames': videos * frames,
           'scene': {'objects_per_frame': objects,
                     'crossing': crossing,
                     'crossings_per_video': crossings_per_video,
                     'occlusion_frames': (list(occlusion)
                                          if isinstance(occlusion,
                                                        (tuple, list))
                                          else occlusion),
                     'clutter': clutter,
                     'object_scale_jitter': object_scale_jitter,
                     'camera_pan': camera_pan},
           'per_video': per_video,
           'bar': {'map': bar_map, 'mota': bar_mota},
           'passed': bool(overall['map'] >= bar_map
                          and overall['mota'] > bar_mota)}
    if transfer_from:
        # Provenance for resumed cross-resolution runs (e.g. the 416²
        # row fine-tuned from the 160²-trained checkpoint): the conv
        # stack's parameters are spatially size-independent, so the
        # reference's own pretrain-then-finetune recipe applies across
        # resolutions (MultiObjDetTracker.py:106 fine-tunes from
        # pretrained darknet weights the same way).
        out['transfer_from'] = transfer_from
    print(json.dumps(out))
    if record:
        # benchmarks/QUALITY.json feeds report.py's quality table — only
        # the CLI (full-scale) run writes it, never test miniatures.
        qpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             record_name)
        with open(qpath, 'w') as f:
            json.dump(out, f, indent=1)
    if record or archive_as:
        archive_run_metrics(
            wd, archive_as or record_name.replace('.json', ''))
    return out


def run_seeds(seeds, record_name: str = 'QUALITY.json', **kw) -> dict:
    """Multi-seed joint quality with spread (VERDICT r4 #4): one full
    train+eval per seed (fresh scenes and init), aggregated as means at
    the report.py-schema top level, min/max spread, and a per-seed
    array; passing requires EVERY seed to clear the bar. Each seed's
    metrics.jsonl is archived under benchmarks/runs/."""
    import numpy as np
    base = record_name.replace('.json', '')
    runs = [run(seed=s, record=False,
                archive_as=f'{base}_seed{s}', **kw)
            for s in seeds]
    maps = [r['map'] for r in runs]
    motas = [r['mota'] for r in runs]
    out = dict(runs[0])
    out.update({
        'map': round(float(np.mean(maps)), 4),
        'mota': round(float(np.mean(motas)), 4),
        'motp': round(float(np.mean([r['motp'] for r in runs])), 4),
        'id_switches': int(round(float(np.mean(
            [r['id_switches'] for r in runs])))),
        'seeds': list(seeds),
        'map_min': round(min(maps), 4), 'map_max': round(max(maps), 4),
        'mota_min': round(min(motas), 4),
        'mota_max': round(max(motas), 4),
        'per_seed': [{'seed': s, 'map': r['map'], 'mota': r['mota'],
                      'motp': r['motp'],
                      'id_switches': r['id_switches'],
                      'passed': r['passed']}
                     for s, r in zip(seeds, runs)],
        'passed': bool(all(r['passed'] for r in runs)),
    })
    out.pop('per_video', None)     # per-seed arrays carry the detail now
    print(json.dumps(out))
    qpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         record_name)
    with open(qpath, 'w') as f:
        json.dump(out, f, indent=1)
    return out


def archive_run_metrics(wd: str, name: str) -> str | None:
    """Commit-able run provenance (VERDICT r4 #7): copy the run's
    metrics.jsonl — compacted to 5 significant digits — into the
    tracked benchmarks/runs/<name>.metrics.jsonl, so every RESULTS.md
    stability/quality table regenerates from the repo alone
    (benchmarks/epoch_table.py <file> <steps_per_epoch>) instead of a
    gitignored workdir that round 4's audit found already deleted."""
    import glob
    runs = sorted(glob.glob(os.path.join(wd, 'logs', '*',
                                         'metrics.jsonl')),
                  key=os.path.getmtime)
    if not runs:
        return None
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'runs')
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, f'{name}.metrics.jsonl')

    def compact(v):
        return float(f'{v:.5g}') if isinstance(v, float) else v

    with open(runs[-1]) as src, open(dst, 'w') as f:
        for line in src:
            rec = json.loads(line)
            rec.pop('time', None)          # wall stamps aren't evidence
            f.write(json.dumps({k: compact(v) for k, v in rec.items()})
                    + '\n')
    return dst


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--epochs', type=int, default=40)
    p.add_argument('--size', type=int, default=160)
    p.add_argument('--videos', type=int, default=24)
    p.add_argument('--frames', type=int, default=16)
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--lr', type=float, default=2e-4)
    p.add_argument('--clip', type=float, default=1.0)
    p.add_argument('--warm-up-epochs', type=int, default=2)
    p.add_argument('--objects', type=int, default=3,
                   help='simultaneously-visible objects per frame '
                   '(1 = legacy single-object scenes)')
    p.add_argument('--no-crossing', action='store_true',
                   help='disable crossing trajectories')
    p.add_argument('--occlusion', default='2',
                   help='frames each object is hidden mid-trajectory: '
                   'an int ("2") or a per-object range ("4-6")')
    p.add_argument('--clutter', type=int, default=3,
                   help='unannotated distractor shapes per video')
    p.add_argument('--object-scale-jitter', type=float, default=0.0,
                   help='per-OBJECT box-scale variation (±fraction) — '
                   'MOT17-style near/far size diversity')
    p.add_argument('--camera-pan', type=float, default=0.0,
                   help='smooth camera pan per video, as a fraction of '
                   'the frame (objects can leave and re-enter view)')
    p.add_argument('--window', type=int, default=4,
                   help='training window length T (reference '
                   'SEQUENCE_LENGTH=4); longer windows bridge longer '
                   'occlusions')
    p.add_argument('--bar-map', type=float, default=0.68)
    p.add_argument('--bar-mota', type=float, default=0.58)
    p.add_argument('--record-name', default='QUALITY.json',
                   help='file under benchmarks/ that --record writes '
                        '(e.g. QUALITY_416.json for the full-resolution '
                        'row, keeping the 160-squared row intact)')
    p.add_argument('--workdir')
    p.add_argument('--eval-only', action='store_true',
                   help='skip training; evaluate the checkpoint an '
                   'earlier run left in --workdir')
    p.add_argument('--resume', action='store_true',
                   help='resume an interrupted run from the newest '
                   'checkpoint in --workdir; --epochs then counts '
                   'ADDITIONAL epochs for this invocation')
    p.add_argument('--transfer-from',
                   help='provenance note recorded in the JSON when this '
                   'run fine-tunes a checkpoint trained at another '
                   'resolution (use with --resume)')
    p.add_argument('--resume-lr', type=float,
                   help='override the restored learning rate on resume '
                   '(a plateau-reduced rate follows the checkpoint; '
                   'cross-resolution fine-tuning wants a fresh one)')
    p.add_argument('--seeds', default=None,
                   help='comma-separated seed list (e.g. 0,1) — runs '
                   'every seed and records mean ± min/max; omitted = '
                   'one seed-0 run (legacy)')
    a = p.parse_args()
    occ = (tuple(int(x) for x in a.occlusion.split('-'))
           if '-' in a.occlusion else int(a.occlusion))
    kw = dict(epochs=a.epochs, size=a.size, videos=a.videos,
              frames=a.frames, batch_size=a.batch_size, lr=a.lr,
              grad_clip=a.clip, warm_up_epochs=a.warm_up_epochs,
              objects=a.objects, crossing=not a.no_crossing,
              occlusion=occ, clutter=a.clutter,
              object_scale_jitter=a.object_scale_jitter,
              camera_pan=a.camera_pan, window=a.window,
              bar_map=a.bar_map, bar_mota=a.bar_mota)
    if a.seeds:
        run_seeds([int(s) for s in a.seeds.split(',')],
                  record_name=a.record_name, **kw)
    else:
        run(workdir=a.workdir, record=True, record_name=a.record_name,
            eval_only=a.eval_only, resume=a.resume,
            transfer_from=a.transfer_from, resume_lr=a.resume_lr, **kw)
