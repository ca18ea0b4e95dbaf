"""AOT serving artifact: export -> serialize -> reload -> serve.

The exported artifact must reproduce the in-process JointPredictor
exactly (same program, weights baked as constants) and carry streaming
state across calls — the serving host holds no model code at all
(serving.py docstring; reference deployment contrast:
/root/reference/models_tracking/MultiObjDetTracker.py:295-315).
"""

import numpy as np
import pytest

from object_tracking_tpu.config import YOLOV2_ANCHORS
from object_tracking_tpu.inference import JointPredictor
from object_tracking_tpu.models import MultiObjDetTracker
from object_tracking_tpu.serving import (
    ServedJointPredictor, export_joint, save_artifact)


def _tiny(rng, t=4):
    import jax
    import jax.numpy as jnp
    model = MultiObjDetTracker(num_classes=3, num_anchors=2,
                               convlstm_features=8, width_div=8)
    x = jnp.asarray(rng.rand(1, t, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


@pytest.fixture(scope='module')
def artifact_setup():
    rng = np.random.RandomState(0)
    model, variables = _tiny(rng)
    art = export_joint(model, variables, YOLOV2_ANCHORS[:4],
                       labels=('a', 'b', 'c'), batch=1, window=4,
                       net_size=(64, 64), obj_threshold=0.01,
                       platforms=('cpu',))
    return model, variables, art


def test_artifact_roundtrips_through_disk(artifact_setup, tmp_path):
    _, _, art = artifact_setup
    path = save_artifact(art, str(tmp_path / 'joint.ottserve'))
    served = ServedJointPredictor.load(path)
    assert served.labels == ('a', 'b', 'c')
    assert served.meta['net_size'] == [64, 64]
    assert served.batch == 1 and served.window == 4


def test_served_matches_in_process_predictor(artifact_setup):
    """Two streamed windows through the artifact == the same windows
    through JointPredictor (identical program; uint8 input on both
    sides so normalization quantizes identically)."""
    model, variables, art = artifact_setup
    served = ServedJointPredictor(art)
    pred = JointPredictor(model, variables, YOLOV2_ANCHORS[:4],
                          labels=('a', 'b', 'c'), net_size=(64, 64),
                          obj_threshold=0.01)
    rng = np.random.RandomState(7)
    clip = rng.randint(0, 256, (8, 64, 64, 3), np.uint8)

    ref, got = [], []
    for w in (clip[:4], clip[4:]):
        ref.extend(pred.predict_window(
            np.asarray(w, np.float32) / 255.0))
        got.extend(served.predict_window(w[None])[0])

    assert len(ref) == len(got) == 8
    n_dets = sum(len(f) for f in ref)
    assert n_dets > 0, 'threshold too high: nothing to compare'
    for rf, gf in zip(ref, got):
        assert len(rf) == len(gf)
        for rd, gd in zip(rf, gf):
            assert rd['label'] == gd['label']
            assert rd['track_id'] == gd['track_id']
            np.testing.assert_allclose(rd['score'], gd['score'],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(rd['box'], gd['box'],
                                       rtol=1e-4, atol=1e-5)


def test_reset_state_restarts_streams(artifact_setup):
    _, _, art = artifact_setup
    served = ServedJointPredictor(art)
    rng = np.random.RandomState(3)
    w = rng.randint(0, 256, (1, 4, 64, 64, 3), np.uint8)
    first = served.predict_window(w)
    served.predict_window(w)          # advances ConvLSTM + track state
    served.reset_state()
    again = served.predict_window(w)  # must equal the cold first call
    assert repr(first) == repr(again)


def test_trainer_export_flow(tmp_path):
    """`trainer export` end to end: config -> model -> artifact on disk
    -> served predictions (fresh weights; checkpoint baking covered by
    the flow's shared CheckpointManager.restore path)."""
    from object_tracking_tpu.config import Config
    from object_tracking_tpu.trainer import export_serving

    cfg = Config()
    cfg.detector.image_h = cfg.detector.image_w = 64
    cfg.detector.width_div = 8
    cfg.joint.convlstm_features = 8
    cfg.joint.sequence_length = 3
    cfg.joint.labels = ('1', '2')
    out = str(tmp_path / 'joint.ottserve')
    path = export_serving(cfg, out_path=out, platforms=('cpu',))
    served = ServedJointPredictor.load(path)
    assert served.window == 3 and served.net_h == 64
    frames = np.random.RandomState(0).randint(
        0, 256, (1, 3, 64, 64, 3), np.uint8)
    out_dets = served.predict_window(frames)
    assert len(out_dets) == 1 and len(out_dets[0]) == 3


def test_export_missing_checkpoint_refuses(tmp_path):
    """A given-but-empty --checkpoint-dir must fail loudly, not bake
    random weights (the ADVICE-r4 silent-no-restore class of bug)."""
    from object_tracking_tpu.config import Config
    from object_tracking_tpu.trainer import export_serving

    cfg = Config()
    cfg.detector.image_h = cfg.detector.image_w = 64
    cfg.detector.width_div = 8
    cfg.joint.convlstm_features = 8
    cfg.joint.labels = ('1',)
    with pytest.raises(FileNotFoundError):
        export_serving(cfg, out_path=str(tmp_path / 'x.ottserve'),
                       checkpoint_dir=str(tmp_path / 'empty'),
                       platforms=('cpu',))


def test_deep_head_state_roundtrip(tmp_path):
    """convlstm_layers=2 carries the 4-leaf ((c,h),(cs,hs)) streaming
    state — the other branch of ServedJointPredictor._zero_state."""
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    model = MultiObjDetTracker(num_classes=3, num_anchors=2,
                               convlstm_features=8, width_div=8,
                               convlstm_layers=2)
    x = jnp.asarray(rng.rand(1, 4, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    art = export_joint(model, variables, YOLOV2_ANCHORS[:4],
                       labels=('a', 'b', 'c'), batch=1, window=4,
                       net_size=(64, 64), obj_threshold=0.01,
                       platforms=('cpu',))
    served = ServedJointPredictor(art)
    assert len(served.meta['state_leaves']) == 4
    frames = rng.randint(0, 256, (1, 4, 64, 64, 3), np.uint8)
    first = served.predict_window(frames)
    served.predict_window(frames)
    served.reset_state()
    assert repr(served.predict_window(frames)) == repr(first)


def test_batched_streams_export(artifact_setup):
    """B=2 export: two independent streams in one program, identities
    assigned per stream."""
    rng = np.random.RandomState(0)
    model, variables = _tiny(rng)
    art = export_joint(model, variables, YOLOV2_ANCHORS[:4],
                       labels=('a', 'b', 'c'), batch=2, window=4,
                       net_size=(64, 64), obj_threshold=0.01,
                       platforms=('cpu',))
    served = ServedJointPredictor(art)
    frames = np.random.RandomState(5).randint(
        0, 256, (2, 4, 64, 64, 3), np.uint8)
    out = served.predict_window(frames)
    assert len(out) == 2 and all(len(c) == 4 for c in out)
    # same pixels in both streams -> identical per-stream results
    same = served.__class__(art)
    dup = same.predict_window(
        np.stack([frames[0], frames[0]]))
    assert repr(dup[0]) == repr(dup[1])
