"""Measured-first gate for an int8 quantized inference path.

The v5e MXU's int8 peak is 2x its bf16 peak (394 vs 197 TOPS), so a
post-training-quantized detector could, in principle, double the conv
throughput that dominates the joint program (29.35 of 39.46 GF/frame).
Whether XLA actually routes jax int8 convolutions onto the int8 MXU on
this chip is an empirical question — this probe answers it before any
quantization machinery gets built (the same policy that kept the fused
Pallas decode+NMS kernel unadopted: benchmarks/RESULTS.md micro table).

Times three formulations of the SAME conv workload (Darknet-19's
mid-network shape class), pull-fenced (bench.py methodology):
  1. bf16 conv_general_dilated        (the production baseline)
  2. int8 conv_general_dilated -> int32 accumulate (direct lowering)
  3. int8 im2col (conv_general_dilated_patches) + dot_general int32
     (the fallback formulation if direct int8 conv doesn't lower fast)

Decision rule printed at the end: adopt only if an int8 formulation
beats bf16 by >=1.5x on the representative shape mix.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _fence(x):
    return float(np.asarray(x))


def _time_fn(fn, args, iters_probe=16):
    """Pull-fenced rate (calls/s): chain through a scalar salt."""
    salt = jax.device_put(jnp.float32(0))
    salt = fn(*args, salt)
    _fence(salt)
    start = time.perf_counter()
    for _ in range(iters_probe):
        salt = fn(*args, salt)
    _fence(salt)
    est = iters_probe / (time.perf_counter() - start)
    iters = max(int(est * 3), iters_probe)
    start = time.perf_counter()
    for _ in range(iters):
        salt = fn(*args, salt)
    _fence(salt)
    return iters / (time.perf_counter() - start)


# Representative Darknet-19 shape classes at 416^2 (mfu.py conv table):
# (batch, h, w, cin, cout, k). B folds clip batch x T.
SHAPES = [
    (16, 104, 104, 128, 256, 3),     # conv_8-class (1.6 GF)
    (16, 26, 26, 256, 512, 3),       # conv_13-class
    (16, 13, 13, 1024, 1024, 3),     # conv_19/20-class (3.2 GF)
]


def probe_shape(b, h, w, cin, cout, k):
    rng = np.random.RandomState(0)
    x_f = jax.device_put(jnp.asarray(
        rng.rand(b, h, w, cin), jnp.bfloat16))
    w_f = jax.device_put(jnp.asarray(
        rng.rand(k, k, cin, cout) * 0.1, jnp.bfloat16))
    x_i = jax.device_put(jnp.asarray(
        rng.randint(-127, 128, (b, h, w, cin)), jnp.int8))
    w_i = jax.device_put(jnp.asarray(
        rng.randint(-127, 128, (k, k, cin, cout)), jnp.int8))
    dn = lax.conv_dimension_numbers(
        x_f.shape, w_f.shape, ('NHWC', 'HWIO', 'NHWC'))

    @jax.jit
    def conv_bf16(x, w, salt):
        y = lax.conv_general_dilated(
            x + salt.astype(x.dtype), w, (1, 1), 'SAME',
            dimension_numbers=dn)
        return jnp.tanh(y.astype(jnp.float32).sum()) * 1e-9

    @jax.jit
    def conv_int8(x, w, salt):
        xs = x + salt.astype(jnp.int8)          # data-dependence chain
        y = lax.conv_general_dilated(
            xs, w, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return jnp.tanh(y.astype(jnp.float32).sum()) * 1e-9

    @jax.jit
    def conv_int8_im2col(x, w, salt):
        xs = x + salt.astype(jnp.int8)
        patches = lax.conv_general_dilated_patches(
            xs.astype(jnp.int8), (k, k), (1, 1), 'SAME',
            dimension_numbers=dn)               # (B, H, W, k*k*cin)
        wm = w.transpose(2, 0, 1, 3).reshape(-1, cout)  # match patch order
        y = lax.dot_general(
            patches.reshape(-1, patches.shape[-1]), wm,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return jnp.tanh(y.astype(jnp.float32).sum()) * 1e-9

    gf = 2.0 * b * h * w * k * k * cin * cout / 1e9
    rows = {}
    for name, fn, args in (
            ('bf16', conv_bf16, (x_f, w_f)),
            ('int8', conv_int8, (x_i, w_i)),
            ('int8_im2col', conv_int8_im2col, (x_i, w_i))):
        try:
            rate = _time_fn(fn, args)
            rows[name] = rate * gf / 1e3        # TFLOP(or TOP)/s
        except Exception as e:  # noqa: BLE001 — record, don't crash
            rows[name] = None
            print(f'  {name}: FAILED {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:120]}', file=sys.stderr)
    return gf, rows


def main():
    print(f'devices: {jax.devices()}', file=sys.stderr)
    results = []
    for shape in SHAPES:
        b, h, w, cin, cout, k = shape
        gf, rows = probe_shape(*shape)
        results.append((shape, gf, rows))
        desc = f'B{b} {h}x{w} {cin}->{cout} {k}x{k} ({gf:.1f} GF)'
        parts = ', '.join(
            f'{n}={v:.1f} T/s' if v else f'{n}=FAIL'
            for n, v in rows.items())
        print(f'{desc}: {parts}', flush=True)
    # decision
    speedups = []
    for _, _, rows in results:
        base = rows.get('bf16')
        best_i = max((v for n, v in rows.items()
                      if n != 'bf16' and v), default=None)
        if base and best_i:
            speedups.append(best_i / base)
    if speedups:
        mean = float(np.mean(speedups))
        print(f'int8 best-vs-bf16 speedup per shape: '
              f'{[round(s, 2) for s in speedups]} (mean {mean:.2f}x); '
              f'ADOPT int8 path: {mean >= 1.5}')
    else:
        print('int8 formulations failed to lower/run: DO NOT ADOPT')


if __name__ == '__main__':
    main()
