"""Training-layer tests: callbacks, state, steps, checkpointing, fit loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from object_tracking_tpu.models import TinyTracker
from object_tracking_tpu.training import (
    CheckpointManager, EarlyStopping, MetricLogger, ReduceLROnPlateau,
    TrainState, fit, make_optimizer, make_tiny_eval_step,
    make_tiny_train_step)


# ---------------------------------------------------------------- callbacks
def test_early_stopping_patience():
    es = EarlyStopping(patience=3, min_delta=0.0)
    assert not es.update(1.0)
    assert not es.update(0.9)        # improvement resets
    assert not es.update(0.95)
    assert not es.update(0.95)
    assert es.update(0.95)           # 3rd non-improving epoch → stop


def test_reduce_lr_on_plateau():
    rl = ReduceLROnPlateau(factor=0.5, patience=2, min_lr=1e-5,
                           min_delta=0.0)
    lr = 1e-3
    lr = rl.update(1.0, lr)
    assert lr == 1e-3
    lr = rl.update(1.0, lr)          # wait 1
    lr = rl.update(1.0, lr)          # wait 2 → reduce
    assert lr == pytest.approx(5e-4)
    for _ in range(20):
        lr = rl.update(1.0, lr)
    assert lr >= 1e-5                # clamped at min_lr


# ------------------------------------------------------------------- state
class _MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(nn.tanh(nn.Dense(8)(x)))


def _mlp_state(lr=1e-2):
    m = _MLP()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    return TrainState.create(m.apply, v, make_optimizer(lr))


def test_learning_rate_roundtrip_is_pure():
    st = _mlp_state(1e-3)
    st2 = st.with_learning_rate(5e-4)
    assert st.learning_rate == pytest.approx(1e-3)
    assert st2.learning_rate == pytest.approx(5e-4)


def test_apply_gradients_steps_and_descends():
    st = _mlp_state()
    x = jnp.ones((4, 3))
    y = jnp.full((4, 1), 2.0)

    def loss_fn(p):
        return jnp.mean((st.apply_fn({'params': p}, x) - y) ** 2)

    losses = []
    for _ in range(20):
        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        st = st.apply_gradients(grads)
        losses.append(float(loss))
    assert int(st.step) == 20
    assert losses[-1] < losses[0]


# ------------------------------------------------------------------- steps
def _tiny_batch(rng, b=2, t=3, out=4):
    return {
        'feats': jnp.asarray(rng.rand(b, t, 4, 4, 8), jnp.float32),
        'det': jnp.asarray(rng.rand(b, t, out), jnp.float32),
        'target': jnp.asarray(rng.rand(b, t, out) > 0.5, jnp.float32),
    }


def test_tiny_train_step_learns(rng):
    tt = TinyTracker(lstm_units=16, out_dim=4)
    batch = _tiny_batch(rng)
    v = tt.init(jax.random.PRNGKey(0), batch['feats'], batch['det'])
    st = TrainState.create(tt.apply, v, make_optimizer(1e-2))
    step = make_tiny_train_step()
    first = None
    for _ in range(10):
        st, m = step(st, batch)
        first = first if first is not None else float(m['loss'])
    assert float(m['loss']) < first


def test_tiny_train_step_huber_fits_continuous_coords(rng):
    """The production 'huber' objective (TrackerConfig.loss) trains the
    bbox head onto continuous coordinate targets: loss decreases and the
    fit is tight; eval step reports the same objective."""
    batch = _tiny_batch(rng)
    batch['target'] = jnp.asarray(rng.rand(2, 3, 4) * 0.6 + 0.2,
                                  jnp.float32)   # continuous coords
    tt = TinyTracker(lstm_units=16, out_dim=4)
    v = tt.init(jax.random.PRNGKey(0), batch['feats'], batch['det'])
    st = TrainState.create(tt.apply, v, make_optimizer(1e-2))
    step = make_tiny_train_step(loss_name='huber')
    first = None
    for _ in range(60):
        st, m = step(st, batch)
        first = first if first is not None else float(m['loss'])
    assert float(m['loss']) < first * 0.1
    pred = tt.apply(st.variables, batch['feats'], batch['det'])
    assert float(jnp.mean(jnp.abs(pred - batch['target']))) < 0.05
    ev = make_tiny_eval_step(loss_name='huber')(st, batch)
    assert float(ev['loss']) == pytest.approx(float(m['loss']), rel=0.5)


def test_tiny_eval_step_heatmap_metrics(rng):
    tt = TinyTracker(lstm_units=8, out_dim=16)
    batch = _tiny_batch(rng, out=16)
    v = tt.init(jax.random.PRNGKey(0), batch['feats'], batch['det'])
    st = TrainState.create(tt.apply, v, make_optimizer(1e-3))
    m = make_tiny_eval_step(heatmap=True)(st, batch)
    assert 'heatmap_acc' in m and 0.0 <= float(m['heatmap_acc']) <= 1.0


# -------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path):
    st = _mlp_state()
    x = jnp.ones((4, 3))

    def loss_fn(p):
        return jnp.mean(st.apply_fn({'params': p}, x) ** 2)

    for _ in range(3):
        st = st.apply_gradients(jax.grad(loss_fn)(st.params))

    mgr = CheckpointManager(str(tmp_path / 'ckpt'), max_to_keep=2)
    mgr.save(1, st, metrics={'val_loss': 0.5})
    mgr.wait()
    assert mgr.latest_step() == 1

    template = _mlp_state()
    restored, step = mgr.restore(template)
    assert step == 1
    assert int(restored.step) == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        restored.params, st.params)
    mgr.close()


def test_checkpoint_variables_only_survives_optimizer_drift(tmp_path):
    """Eval restores must not depend on the training optimizer: a
    checkpoint saved with a CHAINED optimizer (grad-clip + Adam, the
    from-scratch joint recipe) restores into a template built with a
    plain optimizer when variables_only=True. The full restore fails on
    the opt_state tree mismatch — this is the regression that broke
    evaluate_tracking after a grad-clipped training run."""
    m = _MLP()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    st = TrainState.create(m.apply, v,
                           make_optimizer(1e-3, grad_clip_norm=1.0))
    mgr = CheckpointManager(str(tmp_path / 'ckpt'))
    mgr.save(1, st)
    mgr.wait()
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / 'ckpt'))
    template = TrainState.create(m.apply, v,
                                 make_optimizer(5e-4))  # plain optimizer
    restored, step = mgr2.restore(template, variables_only=True)
    assert step == 1
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        restored.params, st.params)
    # the template's fresh opt_state is kept, not the checkpoint's
    assert jax.tree_util.tree_structure(restored.opt_state) \
        == jax.tree_util.tree_structure(template.opt_state)
    mgr2.close()


def test_checkpoint_restore_empty_dir(tmp_path):
    mgr = CheckpointManager(str(tmp_path / 'none'))
    st = _mlp_state()
    restored, step = mgr.restore(st)
    assert step is None and restored is st
    mgr.close()


# -------------------------------------------------------------------- loop
def test_fit_loop_end_to_end(tmp_path, rng):
    tt = TinyTracker(lstm_units=8, out_dim=4)
    batch = _tiny_batch(rng)
    v = tt.init(jax.random.PRNGKey(0), batch['feats'], batch['det'])
    st = TrainState.create(tt.apply, v, make_optimizer(1e-2))

    logger = MetricLogger(str(tmp_path / 'logs'), use_tensorboard=False)
    ckpts = CheckpointManager(str(tmp_path / 'ckpt'))
    final = fit(
        st, make_tiny_train_step(),
        lambda: iter([batch, batch]),
        eval_step=make_tiny_eval_step(),
        val_batches=lambda: iter([batch]),
        epochs=2, logger=logger, checkpoints=ckpts,
        early_stopping=EarlyStopping(patience=5),
        reduce_lr=ReduceLROnPlateau(patience=3),
        log_every_steps=1)
    assert int(final.step) == 4
    assert ckpts.latest_step() == 2
    assert os.path.exists(tmp_path / 'logs' / 'metrics.jsonl')
    logger.close()
    ckpts.close()


def test_fit_early_stops(rng):
    tt = TinyTracker(lstm_units=8, out_dim=4)
    batch = _tiny_batch(rng)
    v = tt.init(jax.random.PRNGKey(0), batch['feats'], batch['det'])
    # lr=0 → no improvement → early stop after patience epochs.
    st = TrainState.create(tt.apply, v, make_optimizer(0.0))
    final = fit(
        st, make_tiny_train_step(), lambda: iter([batch]),
        eval_step=make_tiny_eval_step(), val_batches=lambda: iter([batch]),
        epochs=50, early_stopping=EarlyStopping(patience=2, min_delta=0.0))
    assert int(final.step) <= 4


# ------------------------------------------------- fused (device-resident)
def test_fused_joint_steps_match_legacy(tmp_path):
    """The device-resident path (raw uint8 batches + fused steps) must
    compute the SAME loss as the legacy generator pipeline when fed the
    same pixels: normalize/encode merely moved inside the step's jit."""
    from object_tracking_tpu.data import (
        SequenceBatches, make_sequence_windows, parse_annotation_dir)
    from object_tracking_tpu.data.synthetic import make_synthetic_dataset
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.training import (
        make_joint_eval_step, make_joint_eval_step_fused,
        make_joint_train_step_fused)

    img_dir, ann_dir = make_synthetic_dataset(
        str(tmp_path), num_videos=1, frames_per_video=4,
        image_size=(64, 64), labels=('1',))
    anns, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1'])
    wins = make_sequence_windows(anns, 2)
    anchors = [1.0, 1.0]
    common = dict(net_h=64, net_w=64, grid_h=2, grid_w=2,
                  anchors=anchors, batch_size=2, max_boxes=5,
                  augment=False, seed=0)
    legacy = next(iter(SequenceBatches(wins, ['1'], **common)()))
    raw = next(iter(SequenceBatches(wins, ['1'], raw_mode=True,
                                    **common)()))
    assert raw['images_u8'].dtype == np.uint8
    assert raw['images_u8'].shape == (2, 2, 64, 64, 3)

    model = MultiObjDetTracker(num_classes=1, num_anchors=1,
                               convlstm_features=8, width_div=8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 64, 64, 3)))
    state = TrainState.create(model.apply, variables,
                              make_optimizer(1e-3))

    enc = dict(net_h=64, net_w=64, grid_h=2, grid_w=2, num_classes=1,
               true_box_buffer=5)
    fused_eval = make_joint_eval_step_fused(anchors, **enc)
    legacy_eval = make_joint_eval_step(anchors)

    # Feed the legacy path the u8-quantized pixels so the two programs
    # see bit-identical inputs; their losses must then agree exactly.
    legacy_same = dict(legacy)
    legacy_same['images'] = (
        raw['images_u8'].astype(np.float32) / 255.0)
    m_legacy = legacy_eval(state, legacy_same)
    m_fused = fused_eval(state, raw)
    np.testing.assert_allclose(float(m_fused['loss']),
                               float(m_legacy['loss']),
                               rtol=1e-5, atol=1e-6)

    # Un-patched legacy pixels (f32 loader) differ by <= 1 LSB → losses
    # stay close; catches any gross divergence between the two decode
    # paths end to end.
    m_raw_pixels = legacy_eval(state, legacy)
    assert abs(float(m_fused['loss']) - float(m_raw_pixels['loss'])) \
        < 0.05 * max(1.0, abs(float(m_raw_pixels['loss'])))

    # Augmented fused train step: runs, finite, and actually trains.
    fused_train = make_joint_train_step_fused(anchors, augment=True,
                                              **enc)
    step_before = int(state.step)    # read before donation deletes it
    new_state, metrics = fused_train(state, raw)
    assert np.isfinite(float(metrics['loss']))
    assert int(new_state.step) == step_before + 1
