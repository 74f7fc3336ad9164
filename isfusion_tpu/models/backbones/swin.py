"""Swin Transformer image backbone (TPU-native flax implementation).

Parity: `mmdet3d/models/backbones/swin.py` (WindowMSA:20, ShiftWindowMSA:126,
SwinBlock:286, SwinBlockSequence:379, SwinTransformer:465) — Swin-T for the
IS-Fusion image branch (embed 96, depths 2/2/6/2, window 7, out_indices
(1,2,3), `configs/isfusion/isfusion_0075voxel.py`).

TPU-native choices:
- NHWC feature maps end to end; window partition is a static reshape
  (B, H/w, w, W/w, w, C) after padding H/W to window multiples — no dynamic
  shapes, so XLA fuses partition + attention + reverse.
- Shifted windows via jnp.roll + a precomputed (numpy, trace-time) additive
  attention mask, exactly the reference's cyclic-shift scheme.
- Relative position bias table indexed with a static numpy index map.
- Stochastic depth (drop path) via the 'dropout' rng collection.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import BACKBONES
from ..layers import resolve_dtype


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]      # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Additive mask (nW, N, N) for shifted-window attention (trace-time)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class WindowMSA(nn.Module):
    """Multi-head attention within windows + relative position bias."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        """x (B_, N, C) with N = ws*ws; mask (nW, N, N) additive or None."""
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = self.qk_scale or hd ** -0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, nh), jnp.float32)
        idx = _rel_pos_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, nh, n, n) + \
                mask[None, :, None]
            attn = attn.reshape(b, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c).astype(x.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


class ShiftWindowMSA(nn.Module):
    """Pad -> (shift) -> window partition -> MSA -> reverse
    (`swin.py:126`)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int],
                 train: bool = False) -> jnp.ndarray:
        h, w = hw
        b, _, c = x.shape
        ws = self.window_size
        x = x.reshape(b, h, w, c)
        hp = int(np.ceil(h / ws)) * ws
        wp = int(np.ceil(w / ws)) * ws
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        shift = self.shift_size if (hp > ws or wp > ws) else 0
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        # partition: (B, hp/ws, ws, wp/ws, ws, C) -> (B*nW, ws*ws, C)
        x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        x = WindowMSA(self.dim, self.num_heads, ws, self.qkv_bias,
                      self.qk_scale, self.attn_drop, self.proj_drop,
                      dtype=self.dtype,
                      name="w_msa")(x, mask, train=train)
        # reverse
        x = x.reshape(b, hp // ws, wp // ws, ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        return x[:, :h, :w].reshape(b, h * w, c)


class SwinBlock(nn.Module):
    """LN -> (S)W-MSA -> residual -> LN -> MLP -> residual
    (`swin.py:286`)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int],
                 train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        identity = x
        x = nn.LayerNorm(dtype=dt, name="norm1")(x)
        x = ShiftWindowMSA(
            self.dim, self.num_heads, self.window_size,
            self.window_size // 2 if self.shift else 0,
            self.qkv_bias, self.qk_scale, self.attn_drop_rate,
            self.drop_rate, dtype=dt, name="attn")(x, hw, train=train)
        x = identity + DropPath(self.drop_path_rate)(x, train=train)
        identity = x
        y = nn.LayerNorm(dtype=dt, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=dt,
                     name="ffn_fc1")(y)
        # exact erf GELU: torch nn.GELU() default (mmcv FFN act); flax's
        # default tanh approximation diverges ~2e-3 per block
        y = nn.gelu(y, approximate=False)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        y = nn.Dense(self.dim, dtype=dt, name="ffn_fc2")(y)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return identity + DropPath(self.drop_path_rate)(y, train=train)


class PatchMerging(nn.Module):
    """2x2 patch concat + LN + linear 4C->2C downsample (`swin.py` via
    mmcv PatchMerging)."""

    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]
                 ) -> Tuple[jnp.ndarray, Tuple[int, int]]:
        h, w = hw
        b, _, c = x.shape
        x = x.reshape(b, h, w, c)
        hp, wp = h + (h % 2), w + (w % 2)
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        # mmcv PatchMerging uses nn.Unfold(k=2,s=2): samples ordered
        # (x0=TL, x1=TR, x2=BL, x3=BR) row-major within the 2x2 patch.
        x = x.reshape(b, hp // 2, 2, wp // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, 4 * c)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return x, (hp // 2, wp // 2)


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    """Swin backbone over (B, H, W, 3) NHWC images -> multi-scale NHWC
    feature maps at out_indices (`swin.py:465`)."""

    pretrain_img_size: Any = 224
    in_channels: int = 3
    embed_dims: int = 96
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: float = 4.0
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    strides: Sequence[int] = (4, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    patch_norm: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    use_abs_pos_embed: bool = False
    with_cp: bool = False
    convert_weights: bool = True
    frozen_stages: int = -1
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False):
        dt = resolve_dtype(self.compute_dtype)
        if dt is not None:
            img = img.astype(dt)
        b, h0, w0, _ = img.shape
        p = self.patch_size
        hp = int(np.ceil(h0 / p)) * p
        wp = int(np.ceil(w0 / p)) * p
        img = jnp.pad(img, ((0, 0), (0, hp - h0), (0, wp - w0), (0, 0)))
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding="VALID",
                    dtype=dt, name="patch_embed")(img)
        hw = (hp // p, wp // p)
        x = x.reshape(b, hw[0] * hw[1], self.embed_dims)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=dt, name="patch_norm")(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth).tolist()
        outs = []
        dim = self.embed_dims
        blk_idx = 0
        num_stages = len(self.depths)
        for i, depth in enumerate(self.depths):
            nh = self.num_heads[i]
            for d in range(depth):
                # with_cp: rematerialize the block to trade FLOPs for HBM
                # (the reference's torch.utils.checkpoint path).
                cls = nn.remat(SwinBlock, static_argnums=(2, 3)) \
                    if self.with_cp else SwinBlock
                x = cls(
                    dim, nh, self.window_size, shift=(d % 2 == 1),
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, drop_rate=self.drop_rate,
                    attn_drop_rate=self.attn_drop_rate,
                    drop_path_rate=dpr[blk_idx], dtype=dt,
                    name=f"stage{i}_block{d}")(x, hw, train)
                blk_idx += 1
            if i in self.out_indices:
                y = nn.LayerNorm(dtype=dt, name=f"out_norm{i}")(x)
                outs.append(y.reshape(b, hw[0], hw[1], dim))
            if i < num_stages - 1:
                x, hw = PatchMerging(dim * 2, dtype=dt,
                                     name=f"downsample{i}")(x, hw)
                dim *= 2
        return outs
