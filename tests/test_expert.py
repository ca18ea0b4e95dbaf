"""Expert parallelism: MoE routing, explicit all_to_all EP, model wiring.

The reference has no MoE (SURVEY.md §2's parallelism inventory is empty);
these tests pin the framework-added capability: dense/grouped routing
semantics, exactness of the shard_map all_to_all formulation against the
dense one, the GSPMD expert-axis sharding rule, and the MoE tracking
head inside MultiObjDetTracker.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_tracking_tpu.config import MeshConfig
from object_tracking_tpu.parallel import (
    expert_parallel_moe, init_moe_params, make_mesh, moe_apply,
    moe_capacity)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _params(e=8, d=16, h=32, o=12):
    return init_moe_params(jax.random.PRNGKey(0), e, d, h, o)


def test_moe_capacity_static():
    assert moe_capacity(64, 8, 1.0) == 8
    assert moe_capacity(64, 8, 1.25) == 10
    assert moe_capacity(3, 8, 1.0) == 1          # never zero


def test_moe_apply_shapes_and_grad(rng):
    params = _params()
    tokens = jnp.asarray(rng.randn(64, 16), jnp.float32)
    out, aux = moe_apply(params, tokens, return_aux=True)
    assert out.shape == (64, 12)
    assert np.isfinite(float(aux))
    # Balanced-ish random routing keeps aux near 1 (= E * Σ 1/E · 1/E).
    g = jax.grad(lambda p: jnp.sum(
        moe_apply(p, tokens) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_moe_overflow_tokens_drop_to_zero(rng):
    """With capacity 1 and all tokens forced to one expert, only the
    first token per group gets expert output (Switch drop semantics)."""
    e, d = 4, 8
    params = _params(e=e, d=d, h=8, o=8)
    # A gate that always picks expert 2:
    gate = np.zeros((d, e), np.float32)
    gate[:, 2] = 10.0
    params = dict(params, gate=jnp.asarray(gate),
                  b2=jnp.zeros_like(params['b2']))
    tokens = jnp.asarray(np.abs(rng.randn(8, d)) + 0.5, jnp.float32)
    out = moe_apply(params, tokens, capacity_factor=e / tokens.shape[0])
    # capacity = ceil(8/4 * 0.5) = 1 → exactly one routed token.
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    assert norms[0] > 0
    assert np.allclose(norms[1:], 0)


def test_moe_groups_route_independently(rng):
    """num_groups=G must equal applying the same MoE per group slice."""
    params = _params()
    tokens = jnp.asarray(rng.randn(64, 16), jnp.float32)
    grouped = moe_apply(params, tokens, num_groups=4)
    per = [moe_apply(params, tokens[i * 16:(i + 1) * 16], num_groups=1)
           for i in range(4)]
    np.testing.assert_allclose(np.asarray(grouped),
                               np.concatenate([np.asarray(p) for p in per]),
                               rtol=1e-5, atol=1e-6)


def test_expert_parallel_matches_grouped_dense(rng):
    mesh = make_mesh(MeshConfig(data_parallel=1,
                                model_parallel=len(jax.devices())))
    s = mesh.shape['model']
    d, h, o = 16, 32, 12
    params = _params(e=s, d=d, h=h, o=o)
    tokens = jnp.asarray(rng.randn(8 * s, d), jnp.float32)

    ep = expert_parallel_moe(params, tokens, mesh, 'model',
                             capacity_factor=1.25)
    dense = moe_apply(params, tokens, num_groups=s,
                      capacity_factor=1.25)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_expert_parallel_rejects_mismatches(rng):
    mesh = make_mesh(MeshConfig(data_parallel=1,
                                model_parallel=len(jax.devices())))
    s = mesh.shape['model']
    params = _params(e=s + 1)
    with pytest.raises(ValueError, match='experts'):
        expert_parallel_moe(params, jnp.zeros((8 * s, 16)), mesh)
    params = _params(e=s)
    with pytest.raises(ValueError, match='divisible'):
        expert_parallel_moe(params, jnp.zeros((8 * s + 1, 16)), mesh)


def test_tp_specs_shard_expert_axis():
    """plan_tp_specs must shard MoE params on their leading expert axis
    (EP), not their trailing channel axis (TP)."""
    from jax.sharding import PartitionSpec as P

    from object_tracking_tpu.parallel import plan_tp_specs
    mesh = make_mesh(MeshConfig(data_parallel=1,
                                model_parallel=len(jax.devices())))
    s = mesh.shape['model']
    variables = {'params': {'tconv_moe': {
        'w1': np.zeros((s, 64, 128), np.float32),
        'b1': np.zeros((s, 128), np.float32),
        'gate': np.zeros((64, s), np.float32),
    }}}
    specs = plan_tp_specs(variables, mesh)
    moe = specs['params']['tconv_moe']
    assert moe['w1'] == P('model', None, None)
    assert moe['b1'] == P('model', None)


def test_moe_head_in_joint_model_trains(rng):
    from object_tracking_tpu.config import (
        YOLOV2_ANCHORS, JointConfig, LossConfig)
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.training import (
        TrainState, make_optimizer, make_joint_train_step)

    b, t, hw, nc, na = 1, 2, 32, 3, 5
    model = MultiObjDetTracker(num_classes=nc, num_anchors=na,
                               convlstm_features=8, width_div=8,
                               moe_experts=4,
                               moe_hidden=16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((b, t, hw, hw, 3)))
    assert 'tconv_moe' in variables['params']

    gh = hw // 32
    batch = {
        'images': jnp.asarray(rng.rand(b, t, hw, hw, 3), jnp.float32),
        'y_true': jnp.zeros((b, t, gh, gh, na, 5 + nc), jnp.float32),
        'true_boxes': jnp.zeros((b, t, 1, 1, 1, 50, 4), jnp.float32),
    }
    # Snapshot before stepping: the train step donates the state, which
    # deletes these buffers.
    before = np.asarray(variables['params']['tconv_moe']['w1'])
    state = TrainState.create(model.apply, variables,
                              make_optimizer(1e-3))
    step = make_joint_train_step(YOLOV2_ANCHORS, LossConfig(),
                                 JointConfig(moe_aux_weight=0.01))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    assert float(metrics['moe_aux']) > 0
    # The MoE head's parameters actually moved.
    after = np.asarray(new_state.params['tconv_moe']['w1'])
    assert not np.allclose(before, after)
