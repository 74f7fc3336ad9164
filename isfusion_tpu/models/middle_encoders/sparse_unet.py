"""SparseUNet middle encoder (PartA2's U-shaped sparse backbone).

Parity: `mmdet3d/models/middle_encoders/sparse_unet.py:11` — the
SparseEncoder-style contracting path plus a decoder that upsamples with
SparseInverseConv3d back to each saved encoder stage's site set, merging
skip connections; outputs both the dense BEV map (spatial_features) and
full-resolution per-voxel seg features (seg_features).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import MIDDLE_ENCODERS
from ...ops.sparse import (SparseGrid, build_sparse_grid,
                           sparse_inverse_conv3d, sparse_to_dense)
from .sparse_encoder import (_SparseConvModule, _vmap_rulebook, _pad3)


class _SparseInverseConvModule(nn.Module):
    out_channels: int
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, sp_low: SparseGrid, target: SparseGrid,
                 train: bool = False) -> SparseGrid:
        from ..layers import MaskedBatchNorm
        cin = sp_low.feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (3, 3, 3, cin, self.out_channels), jnp.float32)
        grid_low, grid_t = sp_low.grid, target.grid
        feats = jax.vmap(
            lambda lf, lc, li, lm, tf, tc, ti, tm: sparse_inverse_conv3d(
                SparseGrid(lf, lc, li, lm, grid_low),
                SparseGrid(tf, tc, ti, tm, grid_t), w, self.stride,
                self.padding))(
            sp_low.feats, sp_low.coords, sp_low.ids, sp_low.mask,
            target.feats, target.coords, target.ids, target.mask)
        cfg = dict(self.norm_cfg or dict(type="BN1d", eps=1e-3,
                                         momentum=0.01))
        x = MaskedBatchNorm(momentum=float(cfg.get("momentum", 0.01)),
                            epsilon=float(cfg.get("eps", 1e-3)))(
            feats, target.mask, train=train)
        x = nn.relu(x)
        x = jnp.where(target.mask[..., None], x, 0.0)
        return target._replace(feats=x)


@MIDDLE_ENCODERS.register_module()
class SparseUNet(nn.Module):
    in_channels: int = 4
    sparse_shape: Sequence[int] = (41, 1600, 1408)
    order: Tuple[str, ...] = ("conv", "norm", "act")
    norm_cfg: Optional[dict] = None
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Any = ((16,), (32, 32, 32), (64, 64, 64),
                             (64, 64, 64))
    encoder_paddings: Any = ((1,), (1, 1, 1), (1, 1, 1),
                             ((0, 1, 1), 1, 1))
    decoder_channels: Any = ((64, 64, 64), (64, 64, 32), (32, 32, 16),
                             (16, 16, 16))
    decoder_paddings: Any = ((1, 0), (1, 0), (0, 0), (0, 1))
    stage_cap_ratios: Sequence[float] = (1.0, 1.0, 0.75, 0.5)

    @nn.compact
    def __call__(self, voxel_features: jnp.ndarray, coors: jnp.ndarray,
                 voxel_mask: jnp.ndarray, train: bool = False) -> dict:
        """(B, V, C) feats + (B, V, 3) zyx coords + mask ->
        dict(spatial_features (B, ny, nx, C*D), seg_features (B, V, C16))."""
        norm_cfg = dict(self.norm_cfg or
                        dict(type="BN1d", eps=1e-3, momentum=0.01))
        grid = tuple(int(g) for g in self.sparse_shape)
        v_cap = voxel_features.shape[1]

        sp = jax.vmap(lambda f, c, m: build_sparse_grid(
            f, c, m, grid, assume_sorted=True))(
            voxel_features, coors, voxel_mask)
        sp = SparseGrid(sp.feats, sp.coords, sp.ids, sp.mask, grid)
        rulebook = _vmap_rulebook(sp)
        sp = _SparseConvModule(self.base_channels, norm_cfg=norm_cfg,
                               name="conv_input")(sp, train=train,
                                                  rulebook=rulebook)

        def cap_for(i: int) -> int:
            r = self.stage_cap_ratios[min(i, len(self.stage_cap_ratios) - 1)]
            return max(int(v_cap * r) // 8 * 8, 8)

        # ---------------- encoder ----------------
        stages = [sp]
        rulebooks = [rulebook]
        for i, blocks in enumerate(self.encoder_channels):
            blocks = tuple(blocks)
            pads = tuple(self.encoder_paddings[i])
            for j, out_ch in enumerate(blocks):
                name = f"encoder_layer{i + 1}_{j}"
                if i != 0 and j == 0:
                    sp = _SparseConvModule(
                        out_ch, stride=(2, 2, 2), padding=_pad3(pads[j]),
                        conv_type="SparseConv3d", out_cap=cap_for(i),
                        norm_cfg=norm_cfg, name=name)(sp, train=train)
                    rulebook = _vmap_rulebook(sp)
                else:
                    sp = _SparseConvModule(
                        out_ch, padding=_pad3(pads[j]), norm_cfg=norm_cfg,
                        name=name)(sp, train=train, rulebook=rulebook)
            stages.append(sp)
            rulebooks.append(rulebook)

        # conv_out -> dense BEV (same as SparseEncoder)
        out = _SparseConvModule(
            self.output_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1),
            padding=(0, 0, 0), conv_type="SparseConv3d",
            out_cap=cap_for(len(self.encoder_channels) - 1),
            norm_cfg=norm_cfg, name="conv_out")(sp, train=train)
        grid_out = out.grid
        dense = jax.vmap(lambda f, c, i, m: sparse_to_dense(
            SparseGrid(f, c, i, m, grid_out)))(
            out.feats, out.coords, out.ids, out.mask)
        b, nz, ny, nx, ch = dense.shape
        spatial = dense.transpose(0, 2, 3, 1, 4).reshape(b, ny, nx, nz * ch)

        # ---------------- decoder ----------------
        x = sp
        n_enc = len(self.encoder_channels)
        for i, channels in enumerate(self.decoder_channels):
            channels = tuple(channels)
            target = stages[n_enc - 1 - i]       # skip connection source
            rb = rulebooks[n_enc - 1 - i]
            # reduce current features, then upsample onto target's sites
            x = _SparseConvModule(channels[0], norm_cfg=norm_cfg,
                                  name=f"decoder_conv{i}")(
                x, train=train, rulebook=rulebooks[n_enc - i])
            if x.grid != target.grid:
                x = _SparseInverseConvModule(
                    channels[1], norm_cfg=norm_cfg,
                    name=f"decoder_up{i}")(x, target, train=train)
            else:
                x = _SparseConvModule(channels[1], norm_cfg=norm_cfg,
                                      name=f"decoder_same{i}")(
                    x, train=train, rulebook=rb)
            merged = jnp.concatenate([x.feats, target.feats], -1)
            x = x._replace(feats=merged)
            x = _SparseConvModule(channels[-1], norm_cfg=norm_cfg,
                                  name=f"decoder_merge{i}")(
                x, train=train, rulebook=rb)
        return dict(spatial_features=spatial, seg_features=x.feats,
                    voxel_coors=coors, voxel_mask=voxel_mask)