"""Single-object trackers: TinyTracker (bbox head) and its heatmap variant.

Re-designs models_tracking/TinyTracker.py:25-41 and
TinyHeatmapTracker.py:26-48 as one flax module:

- per-frame pooling of the frozen detector's feature volume
  ('Global' max-pool or 4x4 max-pool + flatten, per config `pool`,
  TinyTracker.py:29-33);
- concat with the per-frame detection input (bbox vector or flattened
  heatmap, TinyTracker.py:34);
- LSTM(512, return_sequences) — here `jax.lax.scan` over an LSTM cell via
  nn.RNN, O(1) memory in sequence length instead of a fixed
  TimeDistributed unroll (TinyTracker.py:36);
- per-step Dense(out_dim) with sigmoid (TinyTracker.py:37).

`out_dim=4` gives TinyTracker; `out_dim=heatmap_size**2` gives
TinyHeatmapTracker — the only architectural difference in the reference.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class TinyTracker(nn.Module):
    lstm_units: int = 512
    out_dim: int = 4          # 4 → bbox head; hmap² → heatmap head
    pool: str = 'Global'      # 'Global' | 'Max' (config.json:33)
    dtype: Any = jnp.float32
    # Production bbox head: predict a tanh CORRECTION to the detection
    # input instead of the box from scratch (zero-initialized output
    # layer → the model IS the detector echo at init, and training only
    # learns temporal smoothing/occlusion fill-in on top). The
    # from-scratch sigmoid head (reference parity, TinyTracker.py:37)
    # generalizes far worse: measured val huber 0.0018 vs the echo's
    # ~0.0003 — it memorizes training box statistics rather than
    # discovering the 4-of-39-input echo solution.
    residual_det: bool = False

    @nn.compact
    def __call__(self, feats: jnp.ndarray, det: jnp.ndarray):
        """feats (B, T, H, W, C) detector features; det (B, T, D) detection
        input → (B, T, out_dim) sigmoid outputs."""
        b, t = feats.shape[:2]
        x = feats.astype(self.dtype)
        if self.pool == 'Max':
            # 4x4/4 max-pool then flatten (TinyTracker.py:29-31).
            x = x.reshape((b * t,) + x.shape[2:])
            x = nn.max_pool(x, (4, 4), strides=(4, 4))
            x = x.reshape(b, t, -1)
        elif self.pool == 'Global':
            x = jnp.max(x, axis=(2, 3))  # global max over H, W
        else:
            raise ValueError(f'unknown pool mode {self.pool!r}')

        x = jnp.concatenate([x, det.astype(self.dtype)], axis=-1)

        cell = nn.OptimizedLSTMCell(self.lstm_units, dtype=self.dtype)
        x = nn.RNN(cell, name='recurrent_layer')(x)

        if self.residual_det:
            # Presence-gated fusion. One unconditional additive
            # correction serves two masters — keep present-frame boxes
            # tight AND invent boxes on detector-miss frames — and
            # training trades the first for the second (measured: the
            # ungated head scored mean IoU 0.43 vs the echo's 0.53 under
            # a 25% missed-detection regime; its ±0.07/coord regression
            # noise corrupted frames where the detection was already
            # within ~0.03). Gate on detection presence instead:
            #   present frames: det + tanh(zero-init delta) — exactly
            #     the echo at init, trained ONLY by present-frame loss;
            #   missed frames: a from-scratch sigmoid fill-in head,
            #     trained ONLY by missed-frame loss (the LSTM state
            #     carries the track through the gap).
            # CONTRACT (ADVICE r4): 'missed' is det EXACTLY all-zero
            # float32. Both producers (data/generators.py
            # _select_detection's zeros default and det_dropout's
            # np.where-zeroing) emit exact zeros in float32, never a
            # bf16-rounded or epsilon-padded marker; `det` must stay
            # float32 up to this gate. A future prior source must uphold
            # the same convention or pass an explicit presence mask.
            present = (jnp.sum(jnp.abs(det), axis=-1, keepdims=True)
                       > 0)
            delta = nn.Dense(self.out_dim, dtype=self.dtype,
                             kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             name='output')(x)
            corr = (det.astype(jnp.float32)
                    + jnp.tanh(delta).astype(jnp.float32))
            fill = nn.sigmoid(nn.Dense(self.out_dim, dtype=self.dtype,
                                       name='fill')(x))
            return jnp.where(present, corr,
                             fill.astype(jnp.float32))
        y = nn.Dense(self.out_dim, dtype=self.dtype, name='output')(x)
        return nn.sigmoid(y).astype(jnp.float32)
