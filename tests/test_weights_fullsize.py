"""Full-size (stock-layout) darknet `.weights` ingestion rehearsal.

The stock pjreddie `yolov2.weights` (~204 MB, COCO-80 head, darknet
>= 0.2 5-slot header) cannot be downloaded in this environment
(PARITY.md), so this slow test synthesizes a file with the exact same
layout — the full 23-block Darknet-19 plan of KerasYOLO.init_weights
(/root/reference/models_detection/KerasYOLO.py:244-274) at stock channel
widths — and pushes all ~51M floats through BOTH ingestion paths
(ops/weights.load_yolov2_weights and the darknet_cfg cfg-order loader),
asserting exact stream consumption, head shapes, byte-exact export
round-trip, and a pinned 416x416 forward equality between the hand-built
module and the cfg-compiled model. After this, the only untested step on
the stock-weights path is the download itself (VERDICT r3 item 7).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_tracking_tpu.ops.weights import (
    DARKNET19_CONV_PLAN, DARKNET19_IN_CHANNELS, export_yolov2_weights,
    load_yolov2_weights)
from tests.test_models import make_fake_weights_file

COCO_CLASSES = 80
HEAD_OUT = 5 * (5 + COCO_CLASSES)          # 425 — stock yolov2 head


def _expected_floats() -> int:
    n = 0
    for (name, cout, k), cin in zip(DARKNET19_CONV_PLAN,
                                    DARKNET19_IN_CHANNELS):
        n += 4 * cout + cout * cin * k * k   # beta/gamma/mean/var + OIHW
    return n + HEAD_OUT + HEAD_OUT * 1024    # head bias + 1x1 kernel


@pytest.mark.slow
def test_stock_scale_weights_rehearsal(tmp_path):
    path = make_fake_weights_file(num_classes=COCO_CLASSES,
                                  version=(0, 2, 0))
    try:
        # Layout: 5-slot header + every parameter of the 23-block plan;
        # ~204 MB, the same float count the stock download carries.
        n_floats = _expected_floats()
        assert os.path.getsize(path) == (5 + n_floats) * 4
        assert os.path.getsize(path) > 200 * 1000 * 1000

        loaded = load_yolov2_weights(path, num_classes=COCO_CLASSES)
        # Exact consumption: the plan accounts for every float after the
        # header — nothing skipped, nothing left over.
        assert (5 + n_floats) * 4 == os.path.getsize(path)
        p = loaded['params']
        assert p['conv_23']['kernel'].shape == (1, 1, 1024, HEAD_OUT)
        assert p['conv_23']['bias'].shape == (HEAD_OUT,)
        assert p['conv_22']['kernel'].shape == (3, 3, 1280, 1024)
        assert loaded['batch_stats']['norm_22']['var'].shape == (1024,)

        # Byte-exact export round-trip: writer is the loader's inverse
        # at stock scale (header included).
        out = str(tmp_path / 'roundtrip.weights')
        export_yolov2_weights(loaded, out, seen=0)
        np.testing.assert_array_equal(
            np.fromfile(out, np.uint8), np.fromfile(path, np.uint8))

        # Pinned forward at the stock 416x416 resolution through the
        # hand-built module...
        from object_tracking_tpu.models.darknet19 import Darknet19
        model = Darknet19(num_classes=COCO_CLASSES, num_anchors=5)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 416, 416, 3),
                        jnp.float32)
        variables = {
            'params': jax.tree_util.tree_map(jnp.asarray,
                                             loaded['params']),
            'batch_stats': jax.tree_util.tree_map(
                jnp.asarray, loaded['batch_stats'])}
        ref_out = model.apply(variables, x, train=False)['netout']
        assert ref_out.shape == (1, 13, 13, 5, 5 + COCO_CLASSES)
        assert np.isfinite(np.asarray(ref_out)).all()

        # ...and through the cfg-compiled path ("hand the loader any
        # cfg + weights", YOLO.py:128-134 capability) — bit-exact match.
        from object_tracking_tpu.models.darknet_cfg import (
            build_from_cfg, load_weights_for_cfg)
        from tests.test_darknet_cfg import YOLOV2_CFG
        cfg416 = YOLOV2_CFG.replace('height=64', 'height=416') \
                           .replace('width=64', 'width=416') \
                           .replace('classes=3', f'classes={COCO_CLASSES}') \
                           .replace('filters=40', f'filters={HEAD_OUT}')
        cfg_model, _ = build_from_cfg(cfg416)
        cfg_vars = jax.tree_util.tree_map(
            jnp.asarray, load_weights_for_cfg(path, cfg416))
        cfg_out = cfg_model.apply(cfg_vars, x, train=False)
        np.testing.assert_array_equal(np.asarray(cfg_out['heads'][0]),
                                      np.asarray(ref_out))
    finally:
        os.unlink(path)
