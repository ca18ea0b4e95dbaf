"""Jitted, mesh-shardable train/eval steps for every model family.

Each factory closes over the pure module + loss config and returns a
`step(state, batch) -> (state, metrics)` function, jitted with donated
state. Parallelism is by *sharding propagation*: the caller lays out the
batch with its leading axis sharded over the mesh `data` axis
(parallel.mesh.shard_batch) and keeps the state replicated; XLA partitions
the step and inserts the gradient all-reduce over ICI. The same compiled
step runs single-chip (trivial mesh) and multi-chip unchanged.

Reference equivalents: the Keras `fit_generator` inner step with
`loss_weights=[0.7, 0.3]` dual loss (MultiObjDetTracker.py:274-288), BCE
TinyTracker step (TinyTracker.py:40), and the standalone detector step
(KerasYOLO.py:494-507, broken in the reference — SURVEY.md §4).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.config import JointConfig, LossConfig
from object_tracking_tpu.models.losses import (
    binary_crossentropy, heatmap_accuracy, yolo_loss)


def _merge_time(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) → (B·T, ...): the reference's loss-side reshape
    (MultiObjDetTracker.py:138-158)."""
    return x.reshape((-1,) + x.shape[2:])


def _yolo_loss_bt(netout, batch, anchors, loss_cfg: LossConfig, step):
    return yolo_loss(
        _merge_time(netout), _merge_time(batch['y_true']),
        _merge_time(batch['true_boxes']), anchors, step,
        warm_up_batches=loss_cfg.warm_up_batches,
        object_scale=loss_cfg.object_scale,
        no_object_scale=loss_cfg.no_object_scale,
        coord_scale=loss_cfg.coord_scale,
        class_scale=loss_cfg.class_scale,
        best_iou_threshold=loss_cfg.best_iou_threshold)


def _joint_loss(variables, apply_fn, batch, anchors,
                loss_cfg: LossConfig, joint_cfg: JointConfig,
                step, train: bool):
    # train=True also covers batch-stat evaluation (updates discarded by
    # the eval step): the reference keeps BatchNorm in training mode
    # globally via K.set_learning_phase(1) (KerasYOLO.py:9,
    # MultiObjDetTracker.py:10), so its val_loss and predictions use
    # batch statistics, never the running averages.
    # 'intermediates' collects sown aux terms (the MoE head's Switch
    # load-balancing loss); a no-op for models that sow nothing.
    mutable = (['batch_stats', 'intermediates'] if train
               else ['intermediates'])
    out, updates = apply_fn(variables, batch['images'], train=train,
                            mutable=mutable)
    t_loss, t_aux = _yolo_loss_bt(out['track'], batch, anchors,
                                  loss_cfg, step)
    d_loss, d_aux = _yolo_loss_bt(out['detect'], batch, anchors,
                                  loss_cfg, step)
    loss = (joint_cfg.loss_weight_track * t_loss
            + joint_cfg.loss_weight_detect * d_loss)
    moe_aux = jnp.float32(0.0)
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            updates.get('intermediates', {})):
        if any('moe_aux_loss' in str(getattr(p, 'key', p))
               for p in path):
            moe_aux = moe_aux + jnp.mean(leaf)
    loss = loss + joint_cfg.moe_aux_weight * moe_aux
    metrics = {'loss': loss, 'track_loss': t_loss, 'detect_loss': d_loss,
               'track_recall': t_aux['recall'],
               'detect_recall': d_aux['recall'],
               'moe_aux': moe_aux}
    # Per-component breakdown, weighted like the total loss — the
    # reference printed exactly these each step (tf.Print,
    # KerasYOLO.py:226-233 with DETECTOR:/TRACKER: prefixes); here they
    # are returned aux so the logger/JSONL carries them per epoch.
    wt, wd = joint_cfg.loss_weight_track, joint_cfg.loss_weight_detect
    for comp in ('loss_xy', 'loss_wh', 'loss_conf', 'loss_class'):
        metrics[comp] = wt * t_aux[comp] + wd * d_aux[comp]
    return loss, (metrics, updates)


def make_joint_train_step(anchors, loss_cfg: Optional[LossConfig] = None,
                          joint_cfg: Optional[JointConfig] = None
                          ) -> Callable:
    loss_cfg = loss_cfg or LossConfig()
    joint_cfg = joint_cfg or JointConfig()
    # Host-side on purpose: a device array closed over by jit is
    # fetched back to host for constant embedding, which fails on
    # the axon TPU backend (and wastes a transfer everywhere else).
    anchors = np.asarray(anchors, np.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        grad_fn = jax.value_and_grad(
            lambda p: _joint_loss(
                {'params': p, 'batch_stats': state.batch_stats},
                state.apply_fn, batch, anchors, loss_cfg, joint_cfg,
                state.step, train=True),
            has_aux=True)
        (_, (metrics, updates)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(
            grads, new_batch_stats=updates.get('batch_stats'))
        return new_state, metrics

    return step


def make_joint_eval_step(anchors, loss_cfg: Optional[LossConfig] = None,
                         joint_cfg: Optional[JointConfig] = None,
                         use_batch_stats: bool = True) -> Callable:
    """Eval step. `use_batch_stats=True` (default) evaluates with batch
    statistics — reference parity (K.set_learning_phase(1) keeps BN in
    training mode for val_loss too) and the stable choice early in
    training, before the running averages have converged; stat updates
    are discarded. False uses the running averages."""
    loss_cfg = loss_cfg or LossConfig()
    joint_cfg = joint_cfg or JointConfig()
    # Host-side on purpose: a device array closed over by jit is
    # fetched back to host for constant embedding, which fails on
    # the axon TPU backend (and wastes a transfer everywhere else).
    anchors = np.asarray(anchors, np.float32)

    @jax.jit
    def step(state, batch):
        _, (metrics, _) = _joint_loss(
            state.variables, state.apply_fn, batch, anchors, loss_cfg,
            joint_cfg, state.step, train=use_batch_stats)
        return metrics

    return step


def _prepare_raw_joint_batch(batch, aug_cfg, encode_fn, augment: bool):
    """Raw uint8 host batch → the images/y_true/true_boxes pytree, all on
    device inside the caller's jit.

    This is the device-resident data path (VERDICT r4 #1): the host ships
    {'images_u8' (B,T,H,W,3) uint8, 'boxes' (B,T,M,4) px, 'cls', 'valid',
    'aug_seeds' (B,) uint32} and everything downstream — /255 normalize,
    sequence-coherent augmentation, YOLO target encoding — happens in the
    SAME compiled program as the train step. The legacy path instead
    augmented+encoded in a separate device program and pulled the
    augmented images back to host (generators.py round trip), costing 3x
    image traffic per step over the host link.
    """
    from object_tracking_tpu.data.augment import augment_sequence
    images = batch['images_u8'].astype(jnp.float32) / 255.0
    boxes = batch['boxes'].astype(jnp.float32)
    if augment:
        # One key per window — identical transform across its frames
        # (the reference's per-sequence reseed trick,
        # preprocessing.py:344-347,364); host supplies per-window seeds.
        base = jax.random.PRNGKey(0)
        keys = jax.vmap(
            lambda s: jax.random.fold_in(base, s))(batch['aug_seeds'])
        images, boxes = jax.vmap(
            lambda k, im, bx: augment_sequence(k, im, bx, aug_cfg))(
            keys, images, boxes)
    y, b = jax.vmap(jax.vmap(encode_fn))(boxes, batch['cls'],
                                         batch['valid'])
    return {'images': images, 'y_true': y, 'true_boxes': b}


def make_joint_train_step_fused(anchors, loss_cfg=None, joint_cfg=None,
                                *, net_h: int = 416, net_w: int = 416,
                                grid_h: int = 13, grid_w: int = 13,
                                num_classes: int = 12,
                                true_box_buffer: int = 50,
                                aug_cfg=None,
                                augment: bool = True) -> Callable:
    """Joint train step over RAW uint8 batches: normalize + augment +
    target-encode + forward/backward/Adam in ONE jitted program — no
    intermediate device→host round trip (see _prepare_raw_joint_batch).
    Pair with SequenceBatches(raw_mode=True)."""
    from object_tracking_tpu.data.augment import AugmentConfig
    from object_tracking_tpu.ops.targets import encode_targets
    loss_cfg = loss_cfg or LossConfig()
    joint_cfg = joint_cfg or JointConfig()
    aug_cfg = aug_cfg or AugmentConfig()
    # Host-side on purpose (axon constant-embedding; see above).
    anchors = np.asarray(anchors, np.float32)

    def encode_fn(bx, cl, vd):
        return encode_targets(
            bx, cl, vd, anchors, image_h=net_h, image_w=net_w,
            grid_h=grid_h, grid_w=grid_w, num_classes=num_classes,
            true_box_buffer=true_box_buffer)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, raw):
        batch = _prepare_raw_joint_batch(raw, aug_cfg, encode_fn,
                                         augment)
        grad_fn = jax.value_and_grad(
            lambda p: _joint_loss(
                {'params': p, 'batch_stats': state.batch_stats},
                state.apply_fn, batch, anchors, loss_cfg, joint_cfg,
                state.step, train=True),
            has_aux=True)
        (_, (metrics, updates)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(
            grads, new_batch_stats=updates.get('batch_stats'))
        return new_state, metrics

    return step


def make_joint_eval_step_fused(anchors, loss_cfg=None, joint_cfg=None,
                               *, net_h: int = 416, net_w: int = 416,
                               grid_h: int = 13, grid_w: int = 13,
                               num_classes: int = 12,
                               true_box_buffer: int = 50,
                               use_batch_stats: bool = True) -> Callable:
    """Eval twin of make_joint_train_step_fused: raw uint8 val batches,
    normalize + encode on device, no augmentation."""
    from object_tracking_tpu.ops.targets import encode_targets
    loss_cfg = loss_cfg or LossConfig()
    joint_cfg = joint_cfg or JointConfig()
    anchors = np.asarray(anchors, np.float32)

    def encode_fn(bx, cl, vd):
        return encode_targets(
            bx, cl, vd, anchors, image_h=net_h, image_w=net_w,
            grid_h=grid_h, grid_w=grid_w, num_classes=num_classes,
            true_box_buffer=true_box_buffer)

    @jax.jit
    def step(state, raw):
        batch = _prepare_raw_joint_batch(raw, None, encode_fn,
                                         augment=False)
        _, (metrics, _) = _joint_loss(
            state.variables, state.apply_fn, batch, anchors, loss_cfg,
            joint_cfg, state.step, train=use_batch_stats)
        return metrics

    return step


def make_detector_train_step(anchors,
                             loss_cfg: Optional[LossConfig] = None
                             ) -> Callable:
    """Standalone YOLOv2 detector training (fixes the reference's broken
    KerasYOLO.train, KerasYOLO.py:441-507). Batch: images (B, H, W, 3),
    y_true (B, GH, GW, A, 5+C), true_boxes (B, 1, 1, 1, TB, 4)."""
    loss_cfg = loss_cfg or LossConfig()
    # Host-side on purpose: a device array closed over by jit is
    # fetched back to host for constant embedding, which fails on
    # the axon TPU backend (and wastes a transfer everywhere else).
    anchors = np.asarray(anchors, np.float32)

    def loss_fn(params, state, batch):
        out, updates = state.apply_fn(
            {'params': params, 'batch_stats': state.batch_stats},
            batch['images'], train=True, mutable=['batch_stats'])
        loss, aux = yolo_loss(
            out['netout'], batch['y_true'], batch['true_boxes'], anchors,
            state.step, warm_up_batches=loss_cfg.warm_up_batches,
            object_scale=loss_cfg.object_scale,
            no_object_scale=loss_cfg.no_object_scale,
            coord_scale=loss_cfg.coord_scale,
            class_scale=loss_cfg.class_scale,
            best_iou_threshold=loss_cfg.best_iou_threshold)
        return loss, (aux, updates)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, updates)), grads = grad_fn(state.params, state, batch)
        new_state = state.apply_gradients(
            grads, new_batch_stats=updates.get('batch_stats'))
        return new_state, {'loss': aux['loss'], 'recall': aux['recall'],
                           'loss_xy': aux['loss_xy'],
                           'loss_wh': aux['loss_wh'],
                           'loss_conf': aux['loss_conf'],
                           'loss_class': aux['loss_class']}

    return step


def make_multihead_detector_train_step(head_specs, net_size,
                                       loss_cfg: Optional[LossConfig]
                                       = None) -> Callable:
    """Standalone training for multi-head ([yolo], v3-family) cfgs.

    The reference's cfg boundary is inference-only for [yolo] heads and
    its Keras training is broken anyway (KerasYOLO.py:449), so this
    exceeds parity: one summed `yolo_loss` per head, each head judged
    at its own grid with its own (pixel → grid-cell converted) anchors,
    against the multi-scale targets of
    ops/targets.encode_targets_multiscale.

    Args:
      head_specs: static per-head tuples
        (anchors_px flat tuple, grid_h, grid_w, num_classes).
      net_size: (net_h, net_w) input pixels.
      Batch: {'images' (B,H,W,3), 'y_true': tuple per head,
              'true_boxes': tuple per head}.
    """
    loss_cfg = loss_cfg or LossConfig()
    net_h, net_w = net_size
    # Host-side numpy on purpose (axon constant-embedding; see above).
    anchors_cells = [
        np.asarray(a, np.float32).reshape(-1, 2)
        * np.asarray([gw / net_w, gh / net_h], np.float32)
        for a, gh, gw, _c in head_specs]

    def one_head_loss(netout, y_true, true_boxes, anchors, step):
        return yolo_loss(
            netout, y_true, true_boxes, anchors, step,
            warm_up_batches=loss_cfg.warm_up_batches,
            object_scale=loss_cfg.object_scale,
            no_object_scale=loss_cfg.no_object_scale,
            coord_scale=loss_cfg.coord_scale,
            class_scale=loss_cfg.class_scale,
            best_iou_threshold=loss_cfg.best_iou_threshold)

    def loss_fn(params, state, batch):
        out, updates = state.apply_fn(
            {'params': params, 'batch_stats': state.batch_stats},
            batch['images'], train=True, mutable=['batch_stats'])
        total = jnp.float32(0.0)
        aux_sum: Dict[str, Any] = {}
        for i, anchors in enumerate(anchors_cells):
            loss, aux = one_head_loss(
                out['heads'][i], batch['y_true'][i],
                batch['true_boxes'][i], anchors, state.step)
            total = total + loss
            for k in ('loss', 'loss_xy', 'loss_wh', 'loss_conf',
                      'loss_class'):
                aux_sum[k] = aux_sum.get(k, 0.0) + aux[k]
            aux_sum[f'recall_h{i}'] = aux['recall']
        # Mean recall across heads keeps the logger schema one scalar.
        aux_sum['recall'] = sum(
            aux_sum[f'recall_h{i}'] for i in range(len(anchors_cells))
        ) / len(anchors_cells)
        return total, (aux_sum, updates)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, updates)), grads = grad_fn(state.params, state, batch)
        new_state = state.apply_gradients(
            grads, new_batch_stats=updates.get('batch_stats'))
        return new_state, {k: aux[k] for k in
                           ('loss', 'recall', 'loss_xy', 'loss_wh',
                            'loss_conf', 'loss_class')}

    return step


def _tiny_loss(variables, apply_fn, batch, heatmap: bool,
               loss_name: str = 'bce'):
    pred = apply_fn(variables, batch['feats'], batch['det'])
    if loss_name == 'bce':
        # reference parity: Keras binary_crossentropy on the sigmoid
        # outputs, even for continuous bbox targets
        # (models_tracking/TinyTracker.py:40)
        loss = binary_crossentropy(pred, batch['target'])
    elif loss_name == 'huber':
        # production objective for the bbox head: BCE against continuous
        # coordinate targets bottoms out at the targets' own entropy and
        # its gradient vanishes long before the box is tight — smooth-L1
        # keeps pulling to convergence
        diff = pred.astype(jnp.float32) - batch['target'].astype(
            jnp.float32)
        a = jnp.abs(diff)
        loss = jnp.mean(jnp.where(a < 1.0, 0.5 * diff * diff, a - 0.5))
    else:
        raise ValueError(f'unknown tracker loss {loss_name!r}')
    metrics = {'loss': loss}
    if heatmap:
        metrics['heatmap_acc'] = heatmap_accuracy(pred, batch['target'])
    return loss, metrics


def make_tiny_train_step(heatmap: bool = False,
                         loss_name: str = 'bce') -> Callable:
    """TinyTracker / TinyHeatmapTracker step. Batch: feats (B, T, h, w, c),
    det (B, T, D), target (B, T, out_dim)."""

    @functools.partial(jax.jit, static_argnames=(), donate_argnums=(0,))
    def step(state, batch):
        grad_fn = jax.value_and_grad(
            lambda p: _tiny_loss({'params': p}, state.apply_fn, batch,
                                 heatmap, loss_name),
            has_aux=True)
        (_, metrics), grads = grad_fn(state.params)
        return state.apply_gradients(grads), metrics

    return step


def make_tiny_eval_step(heatmap: bool = False,
                        loss_name: str = 'bce') -> Callable:

    @jax.jit
    def step(state, batch):
        _, metrics = _tiny_loss(state.variables, state.apply_fn, batch,
                                heatmap, loss_name)
        return metrics

    return step
