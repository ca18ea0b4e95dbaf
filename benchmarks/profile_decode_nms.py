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


def _timeit_chain(make_body, netout, iters: int) -> float:
    """Per-op time from a data-dependent in-jit chain: `iters` back-to-
    back executions inside ONE jitted fori_loop (each round's input is
    perturbed by the previous round's output), one final block. Per-call
    dispatch through the axon tunnel costs ~900 µs, so naive call loops
    measure RTT, not compute — see .claude/skills/verify."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(n):
        def body(i, acc):
            out = make_body(acc)
            return acc + 1e-12 * out
        return jax.lax.fori_loop(0, iters, body, n)

    jax.block_until_ready(chain(netout))        # compile
    t0 = time.perf_counter()
    jax.block_until_ready(chain(netout))
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

        bodies = {
            'decode_only':
                lambda n: jnp.sum(decode_netout(n, anchors, 0.5)[1]),
            'pipeline_decode_topk_pallasnms':
                lambda n: jnp.sum(decode_and_nms(n, anchors)[2]),
            'fused_pallas_decode_nms':
                lambda n: jnp.sum(decode_nms_fused(n, anchors)[1]),
        }
        for name, body in bodies.items():
            dt = _timeit_chain(body, netout, args.iters)
            print(json.dumps({'classes': c, 'bench': name,
                              'us': round(dt * 1e6, 1),
                              'iters': args.iters}), flush=True)

        # equivalence check: fused output == full-N staged pipeline
        fused = jax.jit(lambda n: decode_nms_fused(n, anchors))
        fb, fs = jax.block_until_ready(fused(netout))
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
