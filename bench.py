"""Headline benchmark: joint detect+track frames/sec/chip at 416x416.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so the denominator is
measured here, on the same chip, by executing the reference's *execution
model*: per-frame model calls (TimeDistributed-style, no cross-frame
batching of the conv stack), netout pulled to host, and the reference's
host-side Python decode+greedy-NMS loop (utility/utils.py:208-257
semantics). The numerator is the TPU-native path: one jitted program for
the whole clip (time folded into batch for the convs, lax.scan ConvLSTM)
with on-device decode+NMS, bfloat16 activations.

Both paths run the same MultiObjDetTracker architecture (MOT17 12-class,
ConvLSTM-512) at the reference's production config: 416x416, T=4
(MultiObjDetTracker.py:83,101).

Reliability contract (the driver runs this under a hard timeout):
- jax persistent compilation cache under .jax_cache/ (on disk,
  gitignored per ADVICE r3 — entries are keyed to the exact jax version
  and device topology, so committed copies go stale silently). Warm
  runs skip the multi-minute axon-tunnel compiles entirely; the driver
  runs in this working directory, where the cache persists across
  rounds. A genuinely cold run (fresh clone + cold tunnel) relies on
  the watchdog's fallback emit instead, and the next run is warm.
- the native number is measured fresh on every run, with the ONLY
  truthful fencing available over the axon tunnel: iterations chained
  through a device-resident salt and each timed sample terminated by an
  actual scalar pull (block_until_ready returns before remote execution
  completes here — block-fenced loops measure dispatch rate and read
  ~2x over chip peak). The process's first pull costs a one-time
  85-440 s tunnel setup; it is paid by the first FENCE pull, after
  model init + compile (round-3 fix: paying it serially up FRONT lost
  the race against the watchdog; overlapping it on a side thread can
  wedge the axon client — all device work stays single-threaded).
- the reference denominator comes from benchmarks/MEASURED.json
  (measured on this same chip by `bench.py --full --record`, time-based:
  >= OTT_BENCH_REF_SECS, default 30 s of sampled frames); the emitted
  JSON carries a note with its provenance. `--full` re-measures it.
- a watchdog thread emits the JSON line at OTT_BENCH_BUDGET seconds
  (default 240; 480 for --full) with whatever has been measured, falling
  back to MEASURED.json for anything missing, then exits 0. The line is
  always printed, whatever the tunnel does.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_MEASURED = os.path.join(_REPO, 'benchmarks', 'MEASURED.json')
# --full pays the one-time first-d2h setup (112-220 s measured), so it
# gets a wider default window; the driver's default mode stays at 240 s.
_BUDGET = float(os.environ.get(
    'OTT_BENCH_BUDGET', 480.0 if '--full' in sys.argv else 240.0))
_REF_SECS = float(os.environ.get('OTT_BENCH_REF_SECS', 30.0))

# Shared measurement state; the watchdog reads it if time runs out.
_state: dict = {'native_fps': None, 'ref_fps': None, 'note': []}
_emitted = threading.Lock()


def _log(msg: str) -> None:
    print(f'[bench +{time.perf_counter() - _T0:6.1f}s] {msg}',
          file=sys.stderr, flush=True)


def _recorded() -> dict:
    try:
        with open(_MEASURED) as f:
            return json.load(f)
    except Exception:
        return {}


def _emit_once() -> bool:
    """Print the JSON line exactly once; returns True if we printed."""
    if not _emitted.acquire(blocking=False):
        return False
    rec = _recorded()
    native = _state['native_fps']
    ref = _state['ref_fps']
    note = list(_state['note'])
    if native is None:
        native = rec.get('native_fps', 0.0)
        note.append('native_fps from recorded MEASURED.json')
    if ref is None:
        ref = rec.get('reference_fps', 0.0)
        note.append('reference denominator measured on this chip '
                    f'{rec.get("date", "?")} by bench.py --full '
                    '(re-measure: python bench.py --full)')
        # Self-auditing staleness check (VERDICT r4 Weak #6): flag a
        # recorded denominator older than 30 days so the headline ratio
        # can't silently rest on an ancient measurement.
        try:
            import datetime
            age = (datetime.date.today()
                   - datetime.date.fromisoformat(rec['date'])).days
            if age > 30:
                note.append(f'DENOMINATOR STALE: {age} days old — '
                            'run python bench.py --full --record')
        except Exception:
            note.append('DENOMINATOR UNDATED — '
                        'run python bench.py --full --record')
    out = {
        'metric': 'joint_detect_track_fps_per_chip_416',
        'value': round(float(native), 2),
        'unit': 'frames/sec',
        'vs_baseline': round(float(native) / ref, 2) if ref else 0.0,
        # True iff the headline value was measured fresh in THIS process
        # (the reference denominator may still come from MEASURED.json —
        # the note says so); False = watchdog fallback, value is the
        # recorded number. Machine-readable so consumers need not parse
        # the free-text note (ADVICE r3).
        'measured': _state['native_fps'] is not None,
        # Single-chip MFU at the headline rate: 39.46 GF/frame forward
        # (hand-derived conv-by-conv for this exact model —
        # benchmarks/mfu.py::flops_per_frame) over the v5e bf16 peak of
        # 197 TFLOP/s (the platform string "TPU v5 lite" = v5e; the
        # pull-fenced rates are consistent with that peak, see
        # RESULTS.md MFU table).
        'mfu': round(float(native) * 39.46e9 / 197e12, 3),
    }
    if note:
        out['note'] = '; '.join(note)
    print(json.dumps(out), flush=True)
    return True


def _watchdog() -> None:
    # Dynamic deadline: the base budget is 240 s, but the driver's own
    # external timeout is demonstrably > 240 s (BENCH_r03 captured our
    # 240.0 s watchdog line and recorded rc=0, so the process outlived
    # it; BENCH_r02's rc=124 kill produced nothing). If the one-time d2h
    # tunnel setup lands LATE in the window, only ~15 s of fence+timing
    # remain after it — extend once to let the fresh number finish,
    # capped at +45 s so we still beat a 300 s external kill.
    while True:
        now = time.perf_counter() - _T0
        deadline = _BUDGET
        paid = _state.get('setup_paid_at')
        if paid is not None and paid > _BUDGET - 40.0:
            deadline = min(paid + 40.0, _BUDGET + 45.0)
        if now >= deadline:
            break
        time.sleep(min(deadline - now, 1.0))
    if _emit_once():
        _log('budget reached — emitted with fallback values')
        os._exit(0)


def _host_decode_reference_style(netout, anchors, obj_thresh=0.5,
                                 nms_thresh=0.45):
    """The reference's host decode loop (utils.py:208-257): numpy
    sigmoid/softmax per cell, box build, greedy per-class NMS."""
    gh, gw, na = netout.shape[:3]
    nc = netout.shape[-1] - 5

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    def softmax(x):
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    conf = sigmoid(netout[..., 4])
    probs = conf[..., None] * softmax(netout[..., 5:])
    probs[probs <= obj_thresh] = 0.0

    boxes = []
    for row in range(gh):
        for col in range(gw):
            for a in range(na):
                cls = probs[row, col, a]
                if cls.sum() <= 0:
                    continue
                tx, ty, tw, th = netout[row, col, a, :4]
                x = (col + sigmoid(tx)) / gw
                y = (row + sigmoid(ty)) / gh
                w = anchors[a, 0] * np.exp(tw) / gw
                h = anchors[a, 1] * np.exp(th) / gh
                boxes.append([x, y, w, h, cls.copy()])

    def iou(b1, b2):
        def ov(lo1, hi1, lo2, hi2):
            return max(0.0, min(hi1, hi2) - max(lo1, lo2))
        iw = ov(b1[0] - b1[2] / 2, b1[0] + b1[2] / 2,
                b2[0] - b2[2] / 2, b2[0] + b2[2] / 2)
        ih = ov(b1[1] - b1[3] / 2, b1[1] + b1[3] / 2,
                b2[1] - b2[3] / 2, b2[1] + b2[3] / 2)
        inter = iw * ih
        union = b1[2] * b1[3] + b2[2] * b2[3] - inter
        return inter / union if union > 0 else 0.0

    for c in range(nc):
        order = sorted(range(len(boxes)), key=lambda i: -boxes[i][4][c])
        for i, bi in enumerate(order):
            if boxes[bi][4][c] == 0:
                continue
            for bj in order[i + 1:]:
                if iou(boxes[bi], boxes[bj]) >= nms_thresh:
                    boxes[bj][4][c] = 0.0
    return [b for b in boxes if b[4].max() > obj_thresh]


def main() -> None:
    # Persistent compilation cache: the axon tunnel makes 416-squared
    # compiles cost minutes of wall clock; caching them makes every run
    # after the first land well inside the driver's window.
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(_REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    import jax.numpy as jnp

    sys.path.insert(0, _REPO)
    from object_tracking_tpu.config import YOLOV2_ANCHORS
    from object_tracking_tpu.models import MultiObjDetTracker
    from object_tracking_tpu.ops.decode import decode_and_nms

    t = 4
    num_classes = 12
    anchors = np.asarray(YOLOV2_ANCHORS, np.float32).reshape(5, 2)
    rng = np.random.RandomState(0)
    clip = rng.rand(1, t, 416, 416, 3).astype(np.float32)

    # ---------------- TPU-native path (measured FIRST) ----------------
    # Production input layout: frames stream host->HBM as uint8 (4x less
    # interconnect traffic than f32) and normalize on device, fused into
    # the first conv by XLA.
    #
    # Measurement methodology (hard-won, 2026-08-20): over the axon
    # tunnel `jax.block_until_ready` returns BEFORE remote execution
    # completes — a block-terminated loop measures dispatch rate (we
    # observed an impossible 1659 TFLOP/s that way, ~2x chip peak). The
    # only truthful fence is an actual device->host pull of a value the
    # whole chain depends on, and the process's FIRST pull costs a
    # one-time 85-440 s tunnel setup. So: do init + compile first (no
    # d2h needed), let the first fence pull pay the setup, chain
    # iterations through a device-resident scalar salt (so steps cannot
    # overlap or be elided), and end each timed sample with a scalar
    # pull (~0.1 s RTT amortized over a >= 5 s sample).
    _log(f'devices: {jax.devices()}')
    # One-time d2h tunnel setup (85-440 s lottery): round 3 paid it
    # FIRST, serially, and lost the race against the watchdog; a
    # side-thread overlap is out (a concurrent pull while the main
    # thread uses the device can wedge the axon client — verify skill,
    # 2026-08-20). Instead, order the single-threaded work so the setup
    # is paid by the FIRST FENCE PULL, *after* model init + compile:
    # init and jit dispatch never need device->host, so everything that
    # can be done before the tunnel warms up is already done, and only
    # ~10 s of timing remains after the setup completes.
    model = MultiObjDetTracker(num_classes=num_classes, num_anchors=5,
                               convlstm_features=512,
                               dtype=jnp.bfloat16)
    # Init at 64x64: conv/BN parameter shapes are spatial-independent,
    # and the tiny init program reaches the setup-paying fence pull
    # several seconds sooner than a 416x416 init forward would.
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, t, 64, 64, 3)))

    @jax.jit
    def native_step(variables, frames_u8, salt):
        images = frames_u8.astype(jnp.float32) / 255.0 + salt
        out = model.apply(variables, images, train=False)
        track = out['track'][0]                      # (T, GH, GW, A, 5+C)
        res = jax.vmap(lambda n: decode_and_nms(
            n, jnp.asarray(YOLOV2_ANCHORS)))(track)
        # ~1e-9 perturbation: numerically inert, but makes step k+1's
        # input data-depend on step k's full decode+NMS output.
        new_salt = jnp.tanh(res[0].sum()) * 1e-9
        return res, new_salt

    # Stage the clip in HBM once: passing the numpy buffer re-ships 2 MB
    # through the axon debug tunnel EVERY call, making the loop measure
    # tunnel bandwidth (observed 2.7x run-to-run swings), not the chip.
    # Production input arrives by host DMA streaming, which the tunnel
    # does not represent; uint8 staging keeps the h2d format honest.
    clip_u8 = jax.device_put((clip * 255).astype(np.uint8))
    salt = jax.device_put(jnp.float32(0))
    _log('compiling native step (cached after first run)...')
    res, salt = native_step(variables, clip_u8, salt)   # compile
    _log('compile dispatched; first fence pull pays the d2h setup...')
    float(np.asarray(salt))                             # true fence
    _state['setup_paid_at'] = time.perf_counter() - _T0
    _log('d2h setup paid')
    _log('native step compiled; timing (chained, pull-fenced)...')
    start = time.perf_counter()
    for _ in range(100):
        res, salt = native_step(variables, clip_u8, salt)
    float(np.asarray(salt))
    est = 100 / (time.perf_counter() - start)           # clips/sec
    iters = max(int(est * 5.0), 100)
    start = time.perf_counter()
    for _ in range(iters):
        res, salt = native_step(variables, clip_u8, salt)
    float(np.asarray(salt))
    _state['native_fps'] = iters * t / (time.perf_counter() - start)
    _log(f'native_fps = {_state["native_fps"]:.2f} ({iters} clips)')

    if '--full' not in sys.argv:
        # Default (driver) mode: skip re-measuring the reference-style
        # denominator (it adds a second big compile + 30 s of per-frame
        # sampling); it comes from MEASURED.json (recorded by a --full
        # run on this same chip) and is flagged in the note.
        _emit_once()
        return

    # ---------------- reference-style path (--full) -------------------
    # Per-frame forward (B=1, no cross-frame conv batching), host pull,
    # Python decode+NMS — the reference's execution model on this chip.
    # Time-based sampling: whole T-frame passes until >= _REF_SECS of
    # wall clock (or the budget nears), never fewer than one pass. Each
    # frame's netout is pulled to host, so every step is truthfully
    # fenced by construction.
    @jax.jit
    def frame_forward(variables, frame):
        return model.apply(variables, frame, train=False)['track']

    _log('compiling reference-style per-frame forward...')
    np.asarray(frame_forward(variables, clip[:, :1]))  # compile
    _log('reference path compiled; timing (time-based)...')
    frames_done = 0
    start = time.perf_counter()
    while True:
        for f in range(t):
            netout = np.asarray(
                frame_forward(variables, clip[:, f:f + 1]))[0, 0]
            _host_decode_reference_style(netout, anchors)
        frames_done += t
        elapsed = time.perf_counter() - start
        if elapsed >= _REF_SECS:
            break
        if time.perf_counter() - _T0 > _BUDGET - 20.0:
            _state['note'].append(
                f'reference sampling cut at {elapsed:.1f}s by budget')
            break
    _state['ref_fps'] = frames_done / (time.perf_counter() - start)
    _log(f'ref_fps = {_state["ref_fps"]:.3f} '
         f'({frames_done} frames sampled)')

    if '--record' in sys.argv and not _state['note']:
        # Refresh the recorded fallback numbers after a clean full run.
        with open(_MEASURED, 'w') as f:
            json.dump({'native_fps': round(_state['native_fps'], 2),
                       'reference_fps': round(_state['ref_fps'], 3),
                       'speedup': round(_state['native_fps']
                                        / _state['ref_fps'], 1),
                       'date': os.environ.get('OTT_BENCH_DATE',
                                              'unstamped')},
                      f, indent=1)
        _log('MEASURED.json refreshed')

    _emit_once()


_T0 = time.perf_counter()

if __name__ == '__main__':
    threading.Thread(target=_watchdog, daemon=True).start()
    main()
