"""Entry points + real CLI.

Preserves the reference's three public flows
(/root/reference/trainer.py:8-30) under their original names —
`single_object_tracking`, `simult_multi_obj_detection_tracking`,
`keras_yolo_obj_detection` — but selected by argparse subcommands instead
of editing `__main__` (trainer.py:39-40, no argparse in the reference).

    python -m object_tracking_tpu.trainer joint --synthetic --epochs 2
    python -m object_tracking_tpu.trainer single --config config.json
    python -m object_tracking_tpu.trainer detect --image in.jpg --out out.jpg

Every flow: builds the mesh, wires generators → steps → fit loop with the
checkpoint/early-stop/plateau/TB stack (BaseTracker.py:71-112 semantics),
and supports `--synthetic` for a hermetic end-to-end run on fabricated
data (no reference analogue — it has no runnable demo path at all).
"""

from __future__ import annotations

import argparse
import os
import tempfile
from typing import Optional, Sequence

import numpy as np


def _common_setup(cfg, workdir: Optional[str] = None):
    """mkdir logs/models (reference trainer.py:34-37), multi-host init
    (when cfg.mesh.distributed), mesh, shard fn."""
    from object_tracking_tpu.parallel import (
        distributed_init, make_mesh, shard_batch)
    distributed_init(cfg.mesh)
    base = workdir or '.'
    logs = os.path.join(base, cfg.train.tensorboard_dir)
    models = os.path.join(base, cfg.train.saved_model_dir)
    os.makedirs(logs, exist_ok=True)
    os.makedirs(models, exist_ok=True)
    mesh = make_mesh(cfg.mesh)
    return logs, models, mesh, (lambda b: shard_batch(mesh, b))


def _make_callback_stack(cfg, logs: str, ckpt_dir: str, joint: bool):
    from object_tracking_tpu.training import (
        CheckpointManager, EarlyStopping, MetricLogger, ReduceLROnPlateau)
    from object_tracking_tpu.training.metrics import numbered_run_dir
    logger = MetricLogger(numbered_run_dir(logs))
    ckpts = CheckpointManager(ckpt_dir)
    early = EarlyStopping(patience=cfg.train.early_stop_patience)
    # Joint pipeline defaults to patience 2 + min_lr
    # (MultiObjDetTracker.py:261-266); configurable via
    # train.joint_reduce_lr_patience for from-scratch hard-scene runs.
    reduce_lr = ReduceLROnPlateau(
        factor=cfg.train.reduce_lr_factor,
        patience=(cfg.train.joint_reduce_lr_patience if joint
                  else cfg.train.reduce_lr_patience),
        min_lr=cfg.train.min_lr)
    return logger, ckpts, early, reduce_lr


def _synthetic_dirs(cfg, image_size, labels, frames=12, videos=2):
    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    root = tempfile.mkdtemp(prefix='ott_synth_')
    img_dir, ann_dir = make_synthetic_dataset(
        root, num_videos=videos, frames_per_video=frames,
        image_size=image_size, labels=labels)
    cfg.train.train_image_folder = img_dir
    cfg.train.train_annot_folder = ann_dir
    cfg.train.val_image_folder = img_dir
    cfg.train.val_annot_folder = ann_dir
    return cfg


# --------------------------------------------------------------------------
# Flow 1: single-object tracking (reference trainer.py:8-16)
# --------------------------------------------------------------------------
def single_object_tracking(cfg, *, synthetic: bool = False,
                           epochs: Optional[int] = None,
                           workdir: Optional[str] = None,
                           detector=None):
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.data import (
        TrackerSequenceBatches, make_sequence_windows, parse_annotation_dir)
    from object_tracking_tpu.models import FakeDetector, TinyTracker
    from object_tracking_tpu.training import (
        TrainState, fit, make_optimizer, make_tiny_eval_step,
        make_tiny_train_step)

    heatmap = cfg.tracker.name == 'TinyHeatmapTracker'
    labels = cfg.train.classes
    if synthetic:
        labels = ('1',)
        cfg = _synthetic_dirs(cfg, (128, 128), labels)
    logs, models_dir, mesh, shard_fn = _common_setup(cfg, workdir)

    # Frozen prior source, selected like BaseTracker.load_detection_model
    # (BaseTracker.py:53-60 dispatches on the config name): the TPU
    # YOLOv2 (darknet path), the TPU VGG16 with its own dense detection
    # head (FasterRCNN path), or a deterministic fake.
    if detector is None:
        if cfg.detector.backend == 'vgg16' and not synthetic:
            from object_tracking_tpu.models import VGG16PriorSource
            detector = VGG16PriorSource(
                image_h=cfg.detector.image_h, image_w=cfg.detector.image_w,
                weights_path=cfg.detector.vgg_weights_path,
                det_labels=cfg.detector.labels,
                fc_features=cfg.detector.vgg_fc_features,
                width_div=cfg.detector.vgg_width_div)
        elif cfg.detector.cfg_path and not synthetic:
            # any darknet cfg (+ trained .weights) as the frozen prior
            # source — the reference's "hand the C loader any cfg"
            # boundary (YOLO.py:128-138) feeding BaseTracker
            from object_tracking_tpu.models.darknet_cfg import CfgDetector
            detector = CfgDetector(
                cfg.detector.cfg_path,
                weights_path=cfg.detector.weights_path,
                labels=labels or None,
                obj_threshold=cfg.detector.obj_threshold,
                nms_threshold=cfg.detector.nms_threshold)
        elif synthetic or not cfg.detector.weights_path:
            detector = FakeDetector(feat_shape=(4, 4, 32))
        else:
            from object_tracking_tpu.models import YOLOv2Detector
            detector = YOLOv2Detector(cfg.detector)
    feature_layer = cfg.detector.feature_layer
    if cfg.detector.backend == 'vgg16' and feature_layer == 'conv_feat':
        # YOLO-specific default → the VGG16 path's fc7 vector (the
        # reference hardcodes that 1x1x512 shape, BaseTracker.py:60).
        feature_layer = 'fc7'
    elif feature_layer == 'conv_feat':
        try:
            detector.get_layer_dims(feature_layer)
        except KeyError:
            # cfg-compiled prior source exposes its last activation
            feature_layer = 'final'

    def build(split_img, split_ann):
        anns, seen = parse_annotation_dir(
            split_ann, split_img, labels,
            cache_dir=cfg.train.annotation_cache_dir or None)
        wins = make_sequence_windows(anns, cfg.tracker.sequence_length)
        return TrackerSequenceBatches(
            wins, labels, detector,
            net_h=cfg.detector.image_h, net_w=cfg.detector.image_w,
            batch_size=cfg.train.batch_size,
            target_mode='heatmap' if heatmap else 'bbox',
            heatmap_size=cfg.tracker.heatmap_size,
            tracked_classes=labels, augment=cfg.train.augment,
            seed=cfg.train.seed, feature_layer=feature_layer,
            det_dropout=cfg.tracker.det_dropout)

    train_gen = build(cfg.train.train_image_folder,
                      cfg.train.train_annot_folder)
    val_gen = build(cfg.train.val_image_folder,
                    cfg.train.val_annot_folder)

    out_dim = cfg.tracker.heatmap_size ** 2 if heatmap else 4
    if cfg.tracker.residual and not heatmap \
            and cfg.tracker.loss == 'bce':
        # The residual head emits det + tanh(delta) in [-1, 2];
        # binary_crossentropy clips its input to (0, 1), zeroing
        # gradients whenever the prediction leaves that range — the
        # combination silently fails to train (ADVICE r3).
        raise ValueError(
            "tracker.residual=True requires tracker.loss='huber' "
            "(bce clips the residual head's [-1, 2] output range and "
            'kills its gradients)')
    model = TinyTracker(lstm_units=cfg.tracker.lstm_units,
                        out_dim=out_dim, pool=cfg.tracker.pool,
                        residual_det=cfg.tracker.residual and not heatmap)
    fh, fw, fc = detector.get_layer_dims(feature_layer)
    t = cfg.tracker.sequence_length
    variables = model.init(
        jax.random.PRNGKey(cfg.train.seed),
        jnp.zeros((1, t, fh, fw, fc)), jnp.zeros((1, t, out_dim)))
    state = TrainState.create(
        model.apply, variables,
        make_optimizer(cfg.train.learning_rate,
                       grad_clip_norm=cfg.train.grad_clip_norm))

    logger, ckpts, early, reduce_lr = _make_callback_stack(
        cfg, logs, os.path.join(models_dir, 'tiny_tracker'), joint=False)
    at = 0
    if cfg.train.resume:
        from object_tracking_tpu.parallel import replicated_sharding
        state, at = ckpts.restore(state,
                                  sharding=replicated_sharding(mesh))
        at = at or 0
        if at:
            print(f'resumed from checkpoint step {at}')
        if at and cfg.train.resume_lr is not None:
            state = state.with_learning_rate(cfg.train.resume_lr)
            print(f'resume lr override → {cfg.train.resume_lr:.2e}')
        elif not at and cfg.train.resume_lr is not None:
            # A fine-tune launched against an empty/wrong workdir would
            # silently train from scratch at the base lr (ADVICE r4).
            raise RuntimeError(
                'resume_lr is set but no checkpoint was restored — '
                'check the workdir (a cross-resolution fine-tune would '
                'otherwise train from scratch at the base lr)')
    # Resumed runs continue the epoch/step sequence: orbax silently
    # skips saves with step <= latest existing step, so restarting the
    # counter at 1 would write NO checkpoints until it passed the prior
    # run's last step (ADVICE r2). `epochs` counts additional epochs.
    loss_name = cfg.tracker.loss
    state = fit(state, make_tiny_train_step(heatmap, loss_name),
                train_gen,
                eval_step=make_tiny_eval_step(heatmap, loss_name),
                val_batches=val_gen,
                epochs=at + (epochs or cfg.train.max_epochs),
                initial_epoch=at,
                shard_fn=shard_fn, logger=logger, checkpoints=ckpts,
                early_stopping=early, reduce_lr=reduce_lr,
                log_every_steps=cfg.train.log_every_steps,
                checkpoint_every=cfg.train.checkpoint_every_epochs)
    logger.close()
    ckpts.close()
    return state


# --------------------------------------------------------------------------
# Flow 2: joint multi-object detect+track (reference trainer.py:18-20)
# --------------------------------------------------------------------------
def simult_multi_obj_detection_tracking(cfg, *, synthetic: bool = False,
                                        epochs: Optional[int] = None,
                                        workdir: Optional[str] = None,
                                        image_size: Optional[int] = None,
                                        profile_dir: Optional[str] = None):
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.data import (
        SequenceBatches, make_sequence_windows, parse_annotation_dir)
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.models.yolov2 import rerandomize_head
    from object_tracking_tpu.training import (
        TrainState, fit, make_joint_eval_step, make_joint_eval_step_fused,
        make_joint_train_step, make_joint_train_step_fused,
        make_optimizer)

    labels = cfg.joint.labels
    size = image_size or cfg.detector.image_h
    gh, gw = size // 32, size // 32
    if synthetic:
        labels = ('1', '2')
        cfg = _synthetic_dirs(cfg, (size, size), labels)
    logs, models_dir, mesh, shard_fn = _common_setup(cfg, workdir)

    # Device-resident path (config.py TrainConfig.device_data): raw
    # uint8 batches + the fused steps. debug needs augmented pixels on
    # host for the dump dir, so it keeps the legacy pipeline.
    fused = cfg.train.device_data and not cfg.train.debug

    def build(split_img, split_ann, augment):
        anns, _ = parse_annotation_dir(
            split_ann, split_img, labels,
            cache_dir=cfg.train.annotation_cache_dir or None)
        wins = make_sequence_windows(anns, cfg.joint.sequence_length)
        return SequenceBatches(
            wins, labels, net_h=size, net_w=size, grid_h=gh, grid_w=gw,
            anchors=cfg.detector.anchors,
            batch_size=cfg.joint.batch_size,
            max_boxes=cfg.train.max_boxes_per_image, augment=augment,
            seed=cfg.train.seed, raw_mode=fused,
            debug_dir=('data/debug' if cfg.train.debug else None))

    train_gen = build(cfg.train.train_image_folder,
                      cfg.train.train_annot_folder, cfg.train.augment)
    val_gen = build(cfg.train.val_image_folder,
                    cfg.train.val_annot_folder, False)

    # Sequence parallelism: time_shards > 1 shards the clip's time axis
    # over the mesh `data` axis (host batches are laid out to match).
    ts = cfg.joint.time_shards
    if ts > 1:
        from object_tracking_tpu.parallel import shard_batch
        if cfg.joint.sequence_length % ts:
            raise ValueError(
                f'time_shards={ts} must divide sequence_length='
                f'{cfg.joint.sequence_length}')
        shard_fn = lambda b: shard_batch(mesh, b, axis=1)  # noqa: E731
    model = MultiObjDetTracker(
        num_classes=len(labels), num_anchors=cfg.detector.num_anchors,
        convlstm_features=cfg.joint.convlstm_features,
        width_div=cfg.detector.width_div,
        dtype=jnp.dtype(cfg.joint.compute_dtype), remat=cfg.joint.remat,
        moe_experts=cfg.joint.moe_experts,
        moe_hidden=cfg.joint.moe_hidden,
        convlstm_layers=cfg.joint.convlstm_layers,
        pp_layers=cfg.joint.pp_layers,
        time_shards=ts,
        mesh=mesh if (ts > 1 or cfg.joint.pp_layers) else None)
    t = cfg.joint.sequence_length
    variables = model.init(
        jax.random.PRNGKey(cfg.train.seed),
        jnp.zeros((1, t, size, size, 3)))
    if cfg.detector.weights_path:
        # darknet backbone init + last-conv re-randomization
        # (MultiObjDetTracker.py:221-228)
        from object_tracking_tpu.models import YOLOv2Detector
        det = YOLOv2Detector(cfg.detector)
        params = dict(variables['params'])
        det_params = dict(params['detector'])
        for name, leaf in det.variables['params'].items():
            if name in det_params:
                det_params[name] = leaf
        params['detector'] = det_params
        stats = dict(variables['batch_stats'])
        stats['detector'] = det.variables['batch_stats']
        variables = {'params': params, 'batch_stats': stats}
        variables = rerandomize_head(
            variables, jax.random.PRNGKey(cfg.train.seed + 1), gh, gw)

    state = TrainState.create(
        model.apply, variables,
        make_optimizer(cfg.train.joint_learning_rate,
                       grad_clip_norm=cfg.train.grad_clip_norm))

    logger, ckpts, early, reduce_lr = _make_callback_stack(
        cfg, logs, os.path.join(models_dir, 'multi_obj'), joint=True)
    at = 0
    if cfg.train.resume:
        from object_tracking_tpu.parallel import replicated_sharding
        state, at = ckpts.restore(state,
                                  sharding=replicated_sharding(mesh))
        at = at or 0
        if at:
            print(f'resumed from checkpoint step {at}')
        if at and cfg.train.resume_lr is not None:
            state = state.with_learning_rate(cfg.train.resume_lr)
            print(f'resume lr override → {cfg.train.resume_lr:.2e}')
        elif not at and cfg.train.resume_lr is not None:
            # A fine-tune launched against an empty/wrong workdir would
            # silently train from scratch at the base lr while recording
            # transfer provenance in the output JSON (ADVICE r4).
            raise RuntimeError(
                'resume_lr is set but no checkpoint was restored — '
                'check the workdir (a cross-resolution fine-tune would '
                'otherwise train from scratch at the base lr)')
    import contextlib
    trace_ctx = contextlib.nullcontext()
    if profile_dir:
        # jax.profiler trace over the whole fit: device ops + host spans,
        # viewable in TensorBoard's profile plugin (SURVEY §5 tracing).
        from object_tracking_tpu.utils.profiling import profile_trace
        trace_ctx = profile_trace(profile_dir)
    if fused:
        enc = dict(net_h=size, net_w=size, grid_h=gh, grid_w=gw,
                   num_classes=len(labels),
                   true_box_buffer=cfg.train.max_boxes_per_image)
        train_step = make_joint_train_step_fused(
            cfg.detector.anchors, cfg.loss, cfg.joint,
            augment=cfg.train.augment, **enc)
        eval_step = make_joint_eval_step_fused(
            cfg.detector.anchors, cfg.loss, cfg.joint, **enc)
    else:
        train_step = make_joint_train_step(cfg.detector.anchors,
                                           cfg.loss, cfg.joint)
        eval_step = make_joint_eval_step(cfg.detector.anchors,
                                         cfg.loss, cfg.joint)
    with trace_ctx:
        state = fit(state,
                    train_step,
                    train_gen,
                    eval_step=eval_step,
                    val_batches=val_gen,
                    # continue the restored step sequence so orbax does
                    # not silently skip resumed saves (ADVICE r2);
                    # `epochs` counts additional epochs on resume.
                    epochs=at + (epochs or cfg.train.max_epochs),
                    initial_epoch=at,
                    shard_fn=shard_fn, logger=logger, checkpoints=ckpts,
                    early_stopping=early, reduce_lr=reduce_lr,
                    log_every_steps=cfg.train.log_every_steps,
                checkpoint_every=cfg.train.checkpoint_every_epochs)
    logger.close()
    ckpts.close()
    return state


# --------------------------------------------------------------------------
# Flow 3: standalone detector (reference trainer.py:22-30)
# --------------------------------------------------------------------------
def keras_yolo_obj_detection(cfg, *, images=(), out_dir: str = '.',
                             synthetic: bool = False,
                             epochs: Optional[int] = None,
                             workdir: Optional[str] = None,
                             train: bool = False):
    """Detector flow: predict over images (the reference runs 5 stock
    darknet jpgs, trainer.py:26-30) and/or train standalone (fixing the
    reference's broken KerasYOLO.train, SURVEY.md §4).

    When cfg.detector.cfg_path is set, the detector graph is compiled
    from that darknet .cfg (the reference hands any cfg to the C loader,
    config.json:4 → YOLO.py:128; here models/darknet_cfg.py compiles it)
    and cfg.detector.weights_path is ingested in cfg order."""
    from object_tracking_tpu.models import YOLOv2Detector

    if cfg.detector.cfg_path:
        from object_tracking_tpu.config import LABELS_COCO
        from object_tracking_tpu.models.darknet_cfg import CfgDetector
        labels_arg = cfg.detector.labels or None
        if labels_arg == LABELS_COCO:
            # Unchanged default labels: the cfg's class count is
            # authoritative, so let CfgDetector pick names itself (it
            # uses COCO names when the cfg declares 80 classes) instead
            # of warning about a mismatch the user never expressed.
            labels_arg = None
        detector = CfgDetector(
            cfg.detector.cfg_path, weights_path=cfg.detector.weights_path,
            labels=labels_arg,
            obj_threshold=cfg.detector.obj_threshold,
            nms_threshold=cfg.detector.nms_threshold)
    else:
        detector = YOLOv2Detector(cfg.detector)
    results = {}
    for path in images:
        out = os.path.join(
            out_dir, os.path.basename(path).rsplit('.', 1)[0] + '_out.jpg')
        results[path] = detector.predict(path, out)

    if train or synthetic:
        import jax

        from object_tracking_tpu.data import (
            DetectionBatches, parse_annotation_dir)
        from object_tracking_tpu.training import (
            TrainState, fit, make_detector_train_step, make_optimizer)

        labels = cfg.detector.labels
        size = cfg.detector.image_h
        anchors = cfg.detector.anchors
        if cfg.detector.cfg_path:
            size = detector.net_size[0]
        if synthetic:
            labels = ('1', '2')
            cfg = _synthetic_dirs(cfg, (size, size), labels)
            if cfg.detector.cfg_path:
                from object_tracking_tpu.models.darknet_cfg import (
                    CfgDetector)
                detector = CfgDetector(
                    cfg.detector.cfg_path, labels=labels,
                    obj_threshold=cfg.detector.obj_threshold,
                    nms_threshold=cfg.detector.nms_threshold)
            else:
                detector = YOLOv2Detector(cfg.detector.__class__(
                    labels=labels, image_h=size, image_w=size,
                    grid_h=size // 32, grid_w=size // 32,
                    width_div=cfg.detector.width_div))
        apply_fn = detector.module.apply
        heads_static = None
        if cfg.detector.cfg_path:
            labels = detector.labels
            size = detector.net_size[0]
            module = detector.module
            specs = detector.specs
            if len(specs) == 1 and specs[0]['kind'] == 'region':
                # cfg-compiled [region] detector: its head supplies the
                # grid anchors; adapt {'heads': [...]} to {'netout': ...}.
                anchors = specs[0]['anchors']

                def apply_fn(variables, images, train=False,
                             mutable=False):
                    out = module.apply(variables, images, train=train,
                                       mutable=mutable)
                    if mutable:
                        out, updates = out
                        return {'netout': out['heads'][0]}, updates
                    return {'netout': out['heads'][0]}
            else:
                # Multi-head [yolo] (v3-family) training: per-head grids
                # from one shape eval, multi-scale targets, summed
                # per-head yolo_loss (training/steps.py). The
                # reference's cfg boundary is inference-only here
                # (YOLO.py:128-134) — exceeding parity.
                import jax.numpy as jnp
                out_shapes = jax.eval_shape(
                    lambda x: module.apply(detector.variables, x,
                                           train=False),
                    jax.ShapeDtypeStruct((1, size, size, 3),
                                         jnp.float32))
                heads_static = tuple(
                    (tuple(float(v) for v in
                           np.asarray(s['anchors'],
                                      np.float32).reshape(-1)),
                     int(hs.shape[1]), int(hs.shape[2]),
                     s['num_classes'])
                    for s, hs in zip(specs, out_shapes['heads']))
        logs, models_dir, mesh, shard_fn = _common_setup(cfg, workdir)
        anns, _ = parse_annotation_dir(
            cfg.train.train_annot_folder, cfg.train.train_image_folder,
            labels, cache_dir=cfg.train.annotation_cache_dir or None)
        gen = DetectionBatches(
            anns, labels, net_h=size, net_w=size,
            grid_h=size // 32, grid_w=size // 32,
            anchors=anchors if heads_static is None else (1.0, 1.0),
            batch_size=min(cfg.detector.batch_size, max(len(anns), 1)),
            max_boxes=cfg.train.max_boxes_per_image,
            augment=cfg.train.augment, seed=cfg.train.seed,
            drop_last=False, heads=heads_static)
        state = TrainState.create(
            apply_fn, detector.variables,
            make_optimizer(cfg.train.joint_learning_rate,
                       grad_clip_norm=cfg.train.grad_clip_norm))
        logger, ckpts, early, reduce_lr = _make_callback_stack(
            cfg, logs, os.path.join(models_dir, 'yolov2'), joint=False)
        if heads_static is not None:
            from object_tracking_tpu.training import (
                make_multihead_detector_train_step)
            train_step = make_multihead_detector_train_step(
                heads_static, (size, size), cfg.loss)
        else:
            train_step = make_detector_train_step(anchors, cfg.loss)
        state = fit(state, train_step,
                    gen, epochs=epochs or cfg.train.max_epochs,
                    shard_fn=shard_fn, logger=logger, checkpoints=ckpts,
                    early_stopping=early, reduce_lr=reduce_lr)
        logger.close()
        ckpts.close()
        return state
    return results


# --------------------------------------------------------------------------
# Flow 4: tracking evaluation (the benchmark the reference README lists as
# an unchecked TODO, /root/reference/README.md:61)
# --------------------------------------------------------------------------
def evaluate_tracking(cfg, *, synthetic: bool = False,
                      checkpoint_dir: Optional[str] = None,
                      window: Optional[int] = None,
                      workdir: Optional[str] = None) -> dict:
    """CLEAR-MOT over the val split with a (restored) joint model."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.data import parse_annotation_dir
    from object_tracking_tpu.evaluation import evaluate_tracking_dataset
    from object_tracking_tpu.inference import JointPredictor
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.training import (
        CheckpointManager, TrainState, make_optimizer)

    labels = cfg.joint.labels
    size = cfg.detector.image_h
    if synthetic:
        labels = ('1', '2')
        cfg = _synthetic_dirs(cfg, (size, size), labels)

    model = MultiObjDetTracker(
        num_classes=len(labels), num_anchors=cfg.detector.num_anchors,
        convlstm_features=cfg.joint.convlstm_features,
        width_div=cfg.detector.width_div,
        dtype=jnp.dtype(cfg.joint.compute_dtype),
        moe_experts=cfg.joint.moe_experts,
        moe_hidden=cfg.joint.moe_hidden,
        convlstm_layers=cfg.joint.convlstm_layers)
    t = window or cfg.joint.sequence_length
    variables = model.init(
        jax.random.PRNGKey(cfg.train.seed),
        jnp.zeros((1, t, size, size, 3)))
    if checkpoint_dir:
        state = TrainState.create(model.apply, variables,
                                  make_optimizer(1e-4))
        ckpts = CheckpointManager(checkpoint_dir)
        state, at = ckpts.restore(state, variables_only=True)
        ckpts.close()
        if at:
            print(f'restored checkpoint step {at}')
            variables = state.variables

    predictor = JointPredictor(
        model, variables, cfg.detector.anchors, labels,
        obj_threshold=cfg.detector.obj_threshold,
        nms_threshold=cfg.detector.nms_threshold,
        net_size=(size, size),
        # optimal assignment for evaluation exactness; production
        # predict defaults to the in-jit greedy matcher
        matcher='hungarian')
    anns, _ = parse_annotation_dir(cfg.train.val_annot_folder,
                                   cfg.train.val_image_folder, labels)
    results = evaluate_tracking_dataset(predictor, anns, window=t)
    print(_json.dumps(
        {k: {m: round(float(v), 4) for m, v in r.items()}
         for k, r in results.items()}, indent=2))
    return results


# --------------------------------------------------------------------------
# Flow: AOT serving export — the deployment boundary the reference lacks
# (its predict requires the live Python graph in-process,
# MultiObjDetTracker.py:295-315). One self-contained artifact: StableHLO
# clip program with the trained weights baked in (serving.py).
# --------------------------------------------------------------------------
def export_serving(cfg, *, out_path: str,
                   checkpoint_dir: Optional[str] = None,
                   batch: int = 1, window: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None) -> str:
    """Build the joint model (optionally restoring a checkpoint) and
    write the exported serving artifact to `out_path`."""
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.serving import export_joint, save_artifact
    from object_tracking_tpu.training import (
        CheckpointManager, TrainState, make_optimizer)

    labels = cfg.joint.labels
    size = cfg.detector.image_h
    model = MultiObjDetTracker(
        num_classes=len(labels), num_anchors=cfg.detector.num_anchors,
        convlstm_features=cfg.joint.convlstm_features,
        width_div=cfg.detector.width_div,
        dtype=jnp.dtype(cfg.joint.compute_dtype),
        moe_experts=cfg.joint.moe_experts,
        moe_hidden=cfg.joint.moe_hidden,
        convlstm_layers=cfg.joint.convlstm_layers)
    t = window or cfg.joint.sequence_length
    variables = model.init(
        jax.random.PRNGKey(cfg.train.seed),
        jnp.zeros((1, t, size, size, 3)))
    if checkpoint_dir:
        state = TrainState.create(model.apply, variables,
                                  make_optimizer(1e-4))
        ckpts = CheckpointManager(checkpoint_dir)
        state, at = ckpts.restore(state, variables_only=True)
        ckpts.close()
        if at:
            print(f'restored checkpoint step {at}')
            variables = state.variables
        else:
            raise FileNotFoundError(
                f'no checkpoint under {checkpoint_dir} — refusing to '
                'export random weights silently')
    art = export_joint(
        model, variables, cfg.detector.anchors, labels,
        batch=batch, window=t, net_size=(size, size),
        obj_threshold=cfg.detector.obj_threshold,
        nms_threshold=cfg.detector.nms_threshold,
        platforms=platforms)
    save_artifact(art, out_path)
    plats = list(platforms) if platforms else ['tpu', 'cpu']
    print(f'wrote serving artifact {out_path} '
          f'({len(art) / 1e6:.1f} MB, platforms {",".join(plats)}, '
          f'B={batch} T={t} {size}x{size})')
    return out_path


# --------------------------------------------------------------------------
# Flow 5: offline dataset converters (the reference ships these as
# runnable scripts: utility/motd_to_pascal.py:127, utility/tb_to_pascal.py:152)
# --------------------------------------------------------------------------
def convert_dataset(kind: str, src: str, out_dir: str, *,
                    class_map_path: Optional[str] = None,
                    validation_split: float = 0.25) -> int:
    """MOT17 / VisualTB → per-frame PASCAL-VOC XML trees (train/val[/test]).

    `class_map_path` (VisualTB only): JSON mapping sequence dir → class
    name — either a bare map or a reference-layout config.json with a
    'classes_map' block (config.json:49-125).
    """
    import json as _json

    from object_tracking_tpu.data.converters import (
        mot_to_voc, visualtb_to_voc)

    if kind == 'mot':
        subdirs = [os.path.join(src, d) for d in ('train', 'test')
                   if os.path.isdir(os.path.join(src, d))]
        n = mot_to_voc(subdirs or [src], out_dir,
                       validation_split=validation_split)
    elif kind == 'visualtb':
        if not class_map_path:
            raise ValueError('visualtb conversion needs --class-map '
                             '(sequence → class JSON)')
        with open(class_map_path) as f:
            cm = _json.load(f)
        cm = cm.get('classes_map', cm)     # accept legacy config.json
        n = visualtb_to_voc(src, os.path.join(out_dir, 'train'),
                            os.path.join(out_dir, 'val'), cm,
                            validation_split=validation_split)
    else:
        raise ValueError(f'unknown converter kind {kind!r}')
    print(f'wrote {n} annotation files under {out_dir}')
    return n


# --------------------------------------------------------------------------
# Flow 5: tracked-video inference (the reference's MultiObjDetTracker
# .predict capability, which crashes as shipped — MultiObjDetTracker.py:
# 295-315 — and has no CLI)
# --------------------------------------------------------------------------
def track_video(cfg, *, frames_dir: str, out_dir: str,
                checkpoint_dir: Optional[str] = None,
                window: Optional[int] = None,
                matcher: str = 'greedy',
                out_video: Optional[str] = None,
                fps: Optional[float] = None) -> list:
    """Run the joint model over a directory of frames, drawing per-track
    colored boxes with persistent IDs; returns the per-frame detections.
    `out_video` additionally assembles the drawn frames into one video
    file (container/codec chosen by extension, e.g. `.mp4`/`.avi`).
    `fps=None` uses the source video's frame rate when `frames_dir` is a
    video file (so playback speed matches the input), else 25."""
    import jax
    import jax.numpy as jnp

    from object_tracking_tpu.inference import JointPredictor
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.training import (
        CheckpointManager, TrainState, make_optimizer)

    labels = cfg.joint.labels
    size = cfg.detector.image_h
    t = window or cfg.joint.sequence_length
    model = MultiObjDetTracker(
        num_classes=len(labels), num_anchors=cfg.detector.num_anchors,
        convlstm_features=cfg.joint.convlstm_features,
        width_div=cfg.detector.width_div,
        dtype=jnp.dtype(cfg.joint.compute_dtype),
        moe_experts=cfg.joint.moe_experts,
        moe_hidden=cfg.joint.moe_hidden,
        convlstm_layers=cfg.joint.convlstm_layers)
    variables = model.init(
        jax.random.PRNGKey(cfg.train.seed),
        jnp.zeros((1, t, size, size, 3)))
    if checkpoint_dir:
        state = TrainState.create(model.apply, variables,
                                  make_optimizer(1e-4))
        ckpts = CheckpointManager(checkpoint_dir)
        state, at = ckpts.restore(state, variables_only=True)
        ckpts.close()
        if at:
            print(f'restored checkpoint step {at}')
            variables = state.variables
    predictor = JointPredictor(
        model, variables, cfg.detector.anchors, labels,
        obj_threshold=cfg.detector.obj_threshold,
        nms_threshold=cfg.detector.nms_threshold,
        net_size=(size, size), matcher=matcher)
    tmp = None
    try:
        if os.path.isfile(frames_dir):
            # a video file: decode to frames first (cv2), then track
            import cv2
            cap = cv2.VideoCapture(frames_dir)
            if not cap.isOpened():
                raise FileNotFoundError(frames_dir)
            if fps is None:
                src_fps = cap.get(cv2.CAP_PROP_FPS)
                if src_fps and src_fps > 0:
                    fps = float(src_fps)
            tmp = tempfile.mkdtemp(prefix='ott_video_')
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                cv2.imwrite(os.path.join(tmp, f'{i:06d}.jpg'), frame)
                i += 1
            cap.release()
            frames_dir = tmp
        exts = ('.jpg', '.jpeg', '.png')
        paths = sorted(
            os.path.join(frames_dir, f) for f in os.listdir(frames_dir)
            if f.lower().endswith(exts))
        if not paths:
            raise FileNotFoundError(f'no frames in {frames_dir}')
        results = predictor.predict_video(paths, window=t,
                                          draw_dir=out_dir)
        n_tracks = len({d['track_id'] for dets in results for d in dets})
        print(f'{len(paths)} frames → {out_dir} ({n_tracks} tracks)')
        if out_video:
            _write_video(out_dir, paths, out_video, fps or 25.0)
            print(f'video → {out_video}')
        return results
    finally:
        if tmp is not None:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)


def _write_video(drawn_dir: str, frame_paths, out_path: str,
                 fps: float) -> None:
    """Assemble the drawn frames (named after their sources in
    `drawn_dir`) into one video file via cv2.VideoWriter."""
    import cv2
    first = cv2.imread(os.path.join(
        drawn_dir, os.path.basename(frame_paths[0])))
    if first is None:
        raise FileNotFoundError(
            f'no drawn frame for {frame_paths[0]} in {drawn_dir}')
    h, w = first.shape[:2]
    ext = os.path.splitext(out_path)[1].lower()
    fourcc = cv2.VideoWriter_fourcc(
        *('MJPG' if ext == '.avi' else 'mp4v'))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f'cv2.VideoWriter could not open {out_path}')
    skipped = 0
    try:
        for p in frame_paths:
            img = cv2.imread(os.path.join(
                drawn_dir, os.path.basename(p)))
            if img is None:
                skipped += 1
                continue
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h))
            writer.write(img)
    finally:
        writer.release()
    if skipped:
        import warnings
        warnings.warn(
            f'{skipped}/{len(frame_paths)} drawn frames missing from '
            f'{drawn_dir}; the output video is shorter than the input',
            stacklevel=2)


# --------------------------------------------------------------------------
def _load_cfg(args):
    from object_tracking_tpu.config import Config, load_config
    cfg = load_config(args.config) if args.config else Config()
    if getattr(args, 'epochs', None):
        cfg.train.max_epochs = args.epochs
    return cfg


def main(argv=None) -> int:
    # Persistent compile cache for every CLI flow: repeat/resumed runs
    # skip the multi-minute axon-tunnel compiles (library code never
    # sets this — CLI entry only).
    from object_tracking_tpu.utils import enable_compile_cache
    enable_compile_cache(os.environ.get(
        'OTT_COMPILE_CACHE',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.jax_cache_train')))
    p = argparse.ArgumentParser(
        prog='object_tracking_tpu.trainer',
        description='TPU-native detection & tracking trainer')
    p.add_argument('--config', help='config JSON (new or legacy layout)')
    sub = p.add_subparsers(dest='cmd', required=True)

    ps = sub.add_parser('single', help='single-object tracking '
                        '(TinyTracker / TinyHeatmapTracker)')
    ps.add_argument('--synthetic', action='store_true')
    ps.add_argument('--epochs', type=int)
    ps.add_argument('--heatmap', action='store_true')

    pj = sub.add_parser('joint', help='simultaneous multi-object '
                        'detection + tracking')
    pj.add_argument('--synthetic', action='store_true')
    pj.add_argument('--epochs', type=int)
    pj.add_argument('--image-size', type=int, default=None)
    pj.add_argument('--profile-dir', help='capture a jax.profiler trace '
                    'of the fit loop into this directory')

    pd = sub.add_parser('detect', help='standalone YOLOv2 detector')
    pd.add_argument('--image', action='append', default=[])
    pd.add_argument('--cfg', help='darknet .cfg to compile the detector '
                    'from (any yolov2/tiny/v3-family graph)')
    pd.add_argument('--weights', help='darknet .weights to ingest')
    pd.add_argument('--out-dir', default='.')
    pd.add_argument('--train', action='store_true')
    pd.add_argument('--synthetic', action='store_true')
    pd.add_argument('--epochs', type=int)

    pt = sub.add_parser('track', help='run the joint tracker over a '
                        'frame directory, drawing per-track boxes')
    pt.add_argument('--frames', required=True,
                    help='directory of frames OR a video file (decoded '
                    'via cv2)')
    pt.add_argument('--out-dir', default='tracked')
    pt.add_argument('--checkpoint-dir')
    pt.add_argument('--window', type=int)
    pt.add_argument('--matcher', choices=['greedy', 'hungarian'],
                    default='greedy')
    pt.add_argument('--out-video',
                    help='also assemble the drawn frames into one video '
                    'file (.mp4/.avi)')
    pt.add_argument('--fps', type=float, default=None,
                    help='frame rate for --out-video (default: the '
                    'source video\'s rate, or 25 for frame dirs)')

    pe = sub.add_parser('eval', help='CLEAR-MOT tracking evaluation')
    pe.add_argument('--synthetic', action='store_true')
    pe.add_argument('--checkpoint-dir')
    pe.add_argument('--window', type=int)

    px = sub.add_parser('export', help='AOT-export the joint clip '
                        'program (trained weights baked in) to one '
                        'self-contained serving artifact')
    px.add_argument('--out', required=True, help='artifact output path')
    px.add_argument('--checkpoint-dir', help='orbax checkpoint to bake '
                    'in (omitted = freshly initialized weights, for '
                    'smoke tests only)')
    px.add_argument('--batch', type=int, default=1,
                    help='clip streams per call (B=32 measured 2.4x '
                    'the frames/sec of B=1 — benchmarks/RESULTS.md)')
    px.add_argument('--window', type=int)
    px.add_argument('--platforms', default=None,
                    help='comma list of lowering targets '
                    '(default tpu,cpu)')

    pc = sub.add_parser('convert', help='offline dataset converters '
                        '(MOT17 / VisualTB → PASCAL-VOC XML)')
    pc.add_argument('kind', choices=['mot', 'visualtb'])
    pc.add_argument('--src', required=True,
                    help='dataset root (MOT17 root with train/test, or '
                    'VisualTB root of sequence dirs)')
    pc.add_argument('--out', required=True, help='output XML root')
    pc.add_argument('--class-map',
                    help='VisualTB sequence→class JSON (bare map or '
                    'legacy config.json with classes_map)')
    pc.add_argument('--val-split', type=float, default=0.25)

    args = p.parse_args(argv)
    if args.cmd == 'convert':
        convert_dataset(args.kind, args.src, args.out,
                        class_map_path=args.class_map,
                        validation_split=args.val_split)
        return 0
    cfg = _load_cfg(args)

    if args.cmd == 'single':
        if args.heatmap:
            cfg.tracker.name = 'TinyHeatmapTracker'
        single_object_tracking(cfg, synthetic=args.synthetic,
                               epochs=args.epochs)
    elif args.cmd == 'joint':
        simult_multi_obj_detection_tracking(
            cfg, synthetic=args.synthetic, epochs=args.epochs,
            image_size=args.image_size, profile_dir=args.profile_dir)
    elif args.cmd == 'detect':
        if args.cfg:
            cfg.detector.cfg_path = args.cfg
        if args.weights:
            cfg.detector.weights_path = args.weights
        keras_yolo_obj_detection(cfg, images=args.image,
                                 out_dir=args.out_dir, train=args.train,
                                 synthetic=args.synthetic,
                                 epochs=args.epochs)
    elif args.cmd == 'track':
        track_video(cfg, frames_dir=args.frames, out_dir=args.out_dir,
                    checkpoint_dir=args.checkpoint_dir,
                    window=args.window, matcher=args.matcher,
                    out_video=args.out_video, fps=args.fps)
    elif args.cmd == 'eval':
        evaluate_tracking(cfg, synthetic=args.synthetic,
                          checkpoint_dir=args.checkpoint_dir,
                          window=args.window)
    elif args.cmd == 'export':
        export_serving(
            cfg, out_path=args.out,
            checkpoint_dir=args.checkpoint_dir, batch=args.batch,
            window=args.window,
            platforms=(tuple(args.platforms.split(','))
                       if args.platforms else None))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
