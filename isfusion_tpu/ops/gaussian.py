"""Gaussian heatmap target utilities.

Parity with `mmdet3d/core/utils/gaussian.py` (gaussian_radius,
draw_heatmap_gaussian) but TPU-native: instead of the reference's in-place
local-window painting (dynamic slices), `draw_heatmap_gaussian_batch` paints
all objects onto the full grid with a vectorized max-reduce — static shapes,
jit-friendly, and exactly equivalent where gaussians overlap (max-combine).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gaussian_radius(det_size, min_overlap: float = 0.5):
    """Radius such that a shifted box still overlaps >= min_overlap.

    det_size: (height, width) scalars or arrays.
    """
    height, width = det_size
    xp = jnp if isinstance(height, jnp.ndarray) else np

    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = xp.sqrt(xp.maximum(b1 ** 2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = xp.sqrt(xp.maximum(b2 ** 2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = xp.sqrt(xp.maximum(b3 ** 2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / 2
    return xp.minimum(xp.minimum(r1, r2), r3)


def draw_heatmap_gaussian(heatmap: np.ndarray, center, radius: int,
                          k: float = 1.0) -> np.ndarray:
    """Host/numpy version: paint one gaussian onto (H, W) heatmap in place."""
    diameter = 2 * radius + 1
    sigma = diameter / 6
    y, x = np.ogrid[-radius:radius + 1, -radius:radius + 1]
    gaussian = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    gaussian[gaussian < np.finfo(gaussian.dtype).eps * gaussian.max()] = 0

    cx, cy = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]
    left, right = min(cx, radius), min(width - cx, radius + 1)
    top, bottom = min(cy, radius), min(height - cy, radius + 1)
    if right + left <= 0 or top + bottom <= 0:
        return heatmap
    masked_heatmap = heatmap[cy - top:cy + bottom, cx - left:cx + right]
    masked_gaussian = gaussian[radius - top:radius + bottom,
                               radius - left:radius + right]
    np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap


def draw_heatmap_gaussian_batch(shape_hw, centers_xy: jnp.ndarray,
                                radii: jnp.ndarray,
                                valid: jnp.ndarray) -> jnp.ndarray:
    """Device version: max-combine N gaussians onto a (H, W) grid.

    centers_xy: (N, 2) float (x, y) in grid units; radii: (N,); valid: (N,).
    """
    h, w = shape_hw
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = jnp.floor(centers_xy[:, 0])[:, None, None]
    cy = jnp.floor(centers_xy[:, 1])[:, None, None]
    sigma = ((2 * radii + 1) / 6.0)[:, None, None]
    d2 = (xs[None] - cx) ** 2 + (ys[None] - cy) ** 2
    g = jnp.exp(-d2 / (2 * sigma ** 2))
    # reference zeroes values outside the radius window (square window)
    inside = (jnp.abs(xs[None] - cx) <= radii[:, None, None]) & \
             (jnp.abs(ys[None] - cy) <= radii[:, None, None])
    g = jnp.where(inside & valid[:, None, None], g, 0.0)
    return jnp.max(g, axis=0) if g.shape[0] > 0 else jnp.zeros((h, w))
