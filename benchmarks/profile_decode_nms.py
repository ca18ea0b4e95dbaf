"""Profile-driven decision on a fused decode+NMS Pallas kernel
(SURVEY.md §7.8, VERDICT r1 item 10).

Times, on the real chip, the production `decode_and_nms` end-to-end and
its pieces — grid decode, top-k candidate cap, Pallas NMS — plus the
candidate fused formulation (decode folded into the NMS kernel,
whole-lattice NMS in VMEM, no top_k op). The decision and numbers are
recorded in benchmarks/RESULTS.md.

Usage: python benchmarks/profile_decode_nms.py [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def _timeit(fn, iters: int) -> float:
    import jax
    jax.block_until_ready(fn())            # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_tracking_tpu.config import YOLOV2_ANCHORS
    from object_tracking_tpu.ops.decode import decode_and_nms, decode_netout
    from object_tracking_tpu.ops.nms import greedy_nms_scores
    from object_tracking_tpu.ops.pallas import nms_scores_pallas
    from object_tracking_tpu.ops.pallas.decode_nms_pallas import (
        decode_nms_fused)

    anchors = jnp.asarray(YOLOV2_ANCHORS)
    rng = np.random.RandomState(0)

    for c in (12, 80):
        netout = jnp.asarray(
            rng.randn(13, 13, 5, 5 + c).astype(np.float32))

        pipeline = jax.jit(lambda n: decode_and_nms(n, anchors))
        decode_only = jax.jit(lambda n: decode_netout(n, anchors, 0.5))

        @jax.jit
        def topk_only(n):
            boxes, scores = decode_netout(n, anchors, 0.5)
            best = jnp.max(scores, axis=-1)
            _, idx = jax.lax.top_k(best, 128)
            return boxes[idx], scores[idx]

        b128, s128 = jax.block_until_ready(topk_only(netout))
        nms_only = jax.jit(
            lambda b, s: nms_scores_pallas(b, s, 0.45))
        fused = jax.jit(lambda n: decode_nms_fused(n, anchors))

        rows = {
            'pipeline_decode_topk_pallasnms':
                _timeit(lambda: pipeline(netout), args.iters),
            'decode_only':
                _timeit(lambda: decode_only(netout), args.iters),
            'decode_plus_topk':
                _timeit(lambda: topk_only(netout), args.iters),
            'pallas_nms_only_k128':
                _timeit(lambda: nms_only(b128, s128), args.iters),
            'fused_pallas_decode_nms':
                _timeit(lambda: fused(netout), args.iters),
        }
        print(json.dumps({'classes': c, **{k: round(v * 1e6, 1)
                                           for k, v in rows.items()},
                          'unit': 'us'}))

        # equivalence check: fused output == pipeline output
        fb, fs = jax.block_until_ready(fused(netout))
        pb, ps = pipeline(netout)[:2]
        pl_full = greedy_nms_scores(*decode_netout(netout, anchors, 0.5),
                                    0.45, top_k=0, impl='sort')
        print(json.dumps({
            'classes': c,
            'fused_equals_fullN_sort': bool(
                np.allclose(np.sort(np.asarray(fs).max(-1))[-16:],
                            np.sort(np.asarray(pl_full[1]).max(-1))[-16:],
                            atol=1e-5))}))


if __name__ == '__main__':
    main()
