"""Pallas kernels (interpreter mode on CPU) vs their pure-JAX references."""

import jax.numpy as jnp
import numpy as np
import pytest

from object_tracking_tpu.ops.nms import greedy_nms_scores
from object_tracking_tpu.ops.pallas import nms_scores_pallas


def _random_candidates(rng, n=64, c=6, frac_dead=0.5):
    boxes = np.stack([rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
                      rng.uniform(0.05, 0.4, n),
                      rng.uniform(0.05, 0.4, n)], -1).astype(np.float32)
    scores = rng.rand(n, c).astype(np.float32)
    scores[scores < frac_dead] = 0.0
    return boxes, scores


@pytest.mark.parametrize('thresh', [0.3, 0.45, 0.6])
def test_matmul_impl_matches_sort_impl(rng, thresh):
    boxes, scores = _random_candidates(rng)
    _, out_sort = greedy_nms_scores(jnp.asarray(boxes),
                                    jnp.asarray(scores), thresh,
                                    top_k=0, impl='sort')
    _, out_mm = greedy_nms_scores(jnp.asarray(boxes),
                                  jnp.asarray(scores), thresh,
                                  top_k=0, impl='matmul')
    np.testing.assert_allclose(np.asarray(out_sort), np.asarray(out_mm),
                               atol=1e-6)


def test_pallas_nms_matches_reference(rng):
    boxes, scores = _random_candidates(rng, n=32, c=4)
    out = nms_scores_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                            0.45, interpret=True)
    _, ref = greedy_nms_scores(jnp.asarray(boxes), jnp.asarray(scores),
                               0.45, top_k=0, impl='sort')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)


def test_pallas_nms_all_dead(rng):
    boxes, scores = _random_candidates(rng, n=16, c=3)
    scores[:] = 0.0
    out = nms_scores_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                            0.45, interpret=True)
    assert (np.asarray(out) == 0).all()


def test_fused_decode_nms_matches_staged_pipeline(rng):
    """decode_nms_fused (one kernel, full lattice) == decode_netout →
    full-N greedy NMS, on a small 4x4x3 head."""
    from object_tracking_tpu.ops.decode import decode_netout
    from object_tracking_tpu.ops.pallas import decode_nms_fused

    anchors = np.array([0.8, 0.8, 1.5, 1.5, 2.5, 2.0], np.float32)
    netout = rng.randn(4, 4, 3, 5 + 4).astype(np.float32)
    # push some confidences up so candidates survive the 0.5 threshold
    netout[..., 4] += 1.5

    fb, fs = decode_nms_fused(jnp.asarray(netout), anchors,
                              interpret=True)
    boxes, scores = decode_netout(jnp.asarray(netout), anchors, 0.5)
    _, ref = greedy_nms_scores(boxes, scores, 0.45, top_k=0,
                               impl='sort')
    assert np.asarray(fs).max() > 0          # non-degenerate case
    np.testing.assert_allclose(np.asarray(fb), np.asarray(boxes),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(ref),
                               atol=1e-5)
