"""Occupancy-heatmap codec for TinyHeatmapTracker, as jittable mask ops.

Replaces the Python-loop implementations in the reference
(/root/reference/utility/utils.py:53-58 `generate_heatmap_feat`,
:61-79 `generate_rectangle_from_heatmap`) with vectorized comparisons
against broadcast index grids — no data-dependent control flow, so both
directions jit and vmap cleanly.

Semantics notes vs the reference:
- `generate_heatmap_feat` truncates coordinates with `int()` (toward zero)
  and paints the inclusive block [y : y+h+1, x : x+w+1]. We reproduce that
  with trunc + inclusive masks. The reference inherits numpy's negative-
  index *wraparound* when a box extends past the left/top edge; we clamp
  at 0 instead (wraparound is clearly a latent bug, catalogued in
  SURVEY.md §4).
- `generate_rectangle_from_heatmap` scans cells >= thresh and returns
  (x1, y1, x2, y2) in cell units, with the empty-heatmap sentinel
  (hmap, hmap, -1, -1).
"""

from __future__ import annotations

import jax.numpy as jnp


def heatmap_encode(x, y, w, h, hmap_size: int = 32) -> jnp.ndarray:
    """Binary occupancy grid from a top-left-format normalized box.

    Args:
      x, y: top-left corner in [0, 1] (scalars or broadcastable arrays).
      w, h: width/height in [0, 1].
      hmap_size: grid side length.

    Returns:
      (hmap_size * hmap_size,) float32 flattened heatmap (matching the
      reference's flattened feature layout, utils.py:57).
    """
    s = float(hmap_size)
    sx = jnp.trunc(jnp.asarray(x, jnp.float32) * s)
    sy = jnp.trunc(jnp.asarray(y, jnp.float32) * s)
    sw = jnp.trunc(jnp.asarray(w, jnp.float32) * s)
    sh = jnp.trunc(jnp.asarray(h, jnp.float32) * s)
    rows = jnp.arange(hmap_size, dtype=jnp.float32)[:, None]
    cols = jnp.arange(hmap_size, dtype=jnp.float32)[None, :]
    # inclusive block [sy : sy+sh+1, sx : sx+sw+1] == rows in [sy, sy+sh]
    row_mask = (rows >= sy) & (rows <= sy + sh)
    col_mask = (cols >= sx) & (cols <= sx + sw)
    heat = (row_mask & col_mask).astype(jnp.float32)
    return heat.reshape(-1)


def heatmap_decode_rect(heatmap: jnp.ndarray, thresh: float = 0.75,
                        hmap_size: int = 32):
    """Tightest cell-aligned rectangle covering cells >= thresh.

    Returns (x1, y1, x2, y2) int32 in cell units; empty heatmap yields the
    reference's sentinel (hmap_size, hmap_size, -1, -1) (utils.py:61-66).
    """
    heat = heatmap.reshape(hmap_size, hmap_size)
    mask = heat >= thresh
    rows = jnp.arange(hmap_size, dtype=jnp.int32)[:, None]
    cols = jnp.arange(hmap_size, dtype=jnp.int32)[None, :]
    big = jnp.int32(hmap_size)
    y1 = jnp.min(jnp.where(mask, rows, big))
    x1 = jnp.min(jnp.where(mask, cols, big))
    y2 = jnp.max(jnp.where(mask, rows, -1))
    x2 = jnp.max(jnp.where(mask, cols, -1))
    return x1, y1, x2, y2
