"""Bilinear sampling / resize primitives (pure XLA).

TPU-native replacements for the torch interpolation surface the reference
leans on: `F.interpolate` (GeneralizedLSSFPN top-down upsample,
`necks/generalized_lss.py:94`), `F.grid_sample` (point-to-grid image
sampling `middle_encoders/fusion_encoder.py:965-1040`, PointFusion
`fusion_layers/point_fusion.py`), and the bilinear core of the
ms_deform_attn CUDA kernel (`ops/src/cuda/ms_deform_im2col_cuda.cuh`).

Everything is gather + lerp with static shapes; out-of-bounds samples
contribute zero (torch ``padding_mode='zeros'``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                    ) -> jnp.ndarray:
    """Sample (H, W, C) at float pixel coords x, y (any shape) with zero
    padding outside. Returns coords.shape + (C,)."""
    h, w, c = img.shape
    # gather from the FLATTENED (H*W, C) view: a (H, W, C) operand makes
    # XLA lower a 2-axis gather that runs ~25x slower than a plain row
    # gather (micro_sparse.py rule "always flatten to (V, Z*C) first");
    # P2G image sampling measured 80 -> ~30 ms from this alone (r5)
    flat = img.reshape(h * w, c)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = flat[yi_c * w + xi_c]  # row gather
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = False) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent (bilinear, zeros padding).

    img (H, W, C); grid (..., 2) with normalized coords in [-1, 1],
    grid[..., 0] = x (width axis), grid[..., 1] = y. Returns (..., C).
    """
    h, w, _ = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1) * 0.5 * (w - 1)
        y = (gy + 1) * 0.5 * (h - 1)
    else:
        x = ((gx + 1) * w - 1) * 0.5
        y = ((gy + 1) * h - 1) * 0.5
    return bilinear_sample(img, x, y)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """F.interpolate(mode='bilinear') over NHWC (or HWC) tensors."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        out = jax.vmap(lambda im: bilinear_sample(im, xx, yy))(x)
    else:
        out = jax.image.resize(x, (b, oh, ow, c), method="bilinear")
    return out[0] if squeeze else out
