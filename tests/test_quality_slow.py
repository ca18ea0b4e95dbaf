"""Slow quality-regression test: a miniature train-to-quality run.

The full bar (mAP >= 0.5, MOTA > 0; benchmarks/QUALITY.json) is produced
by benchmarks/train_quality.py on the real chip. This slow-marked test
guards the same path end-to-end at miniature scale: joint training on
synthetic video must be numerically stable (grad clipping + warm-up) and
the CLEAR-MOT + mAP harness must produce finite metrics from the trained
checkpoint. Run with `-m slow` (excluded by default CI selections).
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_train_quality_miniature(tmp_path):
    import benchmarks.train_quality as tq
    out = tq.run(epochs=2, size=64, videos=4, frames=6, batch_size=2,
                 workdir=str(tmp_path))
    assert np.isfinite(out['map'])
    assert np.isfinite(out['mota'])
    assert -10.0 < out['mota'] <= 1.0
    # the miniature runs the round-3 multi-object scene shape end-to-end
    assert out['scene']['objects_per_frame'] == 3
    assert out['per_video'], 'per-video CLEAR-MOT table missing'
