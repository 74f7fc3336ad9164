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
                           build_subm_rulebook, sparse_conv3d,
                           sparse_inverse_conv3d, sparse_to_dense,
                           subm_conv3d)
from .sparse_encoder import _pad3
from ..layers import MaskedBatchNorm, is_sync_norm


# ---- site-level conv modules (round-1 rulebook gather-GEMM engine) ----
# The UNet decoder upsamples back to each saved encoder stage's exact SITE
# set (spconv indice_key reversal), which needs per-site bookkeeping; the
# column engine in sparse_encoder.py intentionally drops it. Voxel counts
# for PartA2/KITTI are ~4x smaller than nuScenes, so the per-site gather
# cost the column engine removes is not the bottleneck here.


def _vmap_site_rulebook(sp: SparseGrid, kernel_size=(3, 3, 3)):
    grid = sp.grid
    return jax.vmap(lambda f, c, i, m: build_subm_rulebook(
        SparseGrid(f, c, i, m, grid), kernel_size))(
            sp.feats, sp.coords, sp.ids, sp.mask)


def _vmap_subm(sp: SparseGrid, weight: jnp.ndarray,
               rulebook=None) -> jnp.ndarray:
    """subm conv over batched SparseGrid (leading B on arrays)."""
    grid = sp.grid
    if rulebook is None:
        return jax.vmap(lambda f, c, i, m: subm_conv3d(
            SparseGrid(f, c, i, m, grid), weight))(
                sp.feats, sp.coords, sp.ids, sp.mask)
    return jax.vmap(lambda f, c, i, m, rs, rf: subm_conv3d(
        SparseGrid(f, c, i, m, grid), weight, (rs, rf)))(
            sp.feats, sp.coords, sp.ids, sp.mask,
            rulebook[0], rulebook[1])


def _vmap_sparse_conv(sp: SparseGrid, weight: jnp.ndarray, stride, padding,
                      out_cap: int) -> SparseGrid:
    grid = sp.grid
    f, c, i, m = jax.vmap(
        lambda f, c, i, m: tuple(sparse_conv3d(
            SparseGrid(f, c, i, m, grid), weight, stride, padding,
            out_cap)[:4]))(sp.feats, sp.coords, sp.ids, sp.mask)
    out_grid = tuple(
        (grid[d] + 2 * (padding[d] if isinstance(padding, (tuple, list))
                        else padding) -
         weight.shape[d]) // (stride[d] if isinstance(stride, (tuple, list))
                              else stride) + 1
        for d in range(3))
    return SparseGrid(f, c, i, m, out_grid)


class _SiteConvModule(nn.Module):
    """conv(+norm)(+act) on a SparseGrid — make_sparse_convmodule parity."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    conv_type: str = "SubMConv3d"
    out_cap: Optional[int] = None
    norm_cfg: Optional[dict] = None
    with_act: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sp: SparseGrid, train: bool = False,
                 rulebook=None) -> SparseGrid:
        cin = sp.feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            tuple(self.kernel_size) + (cin, self.out_channels), jnp.float32)
        if self.conv_type == "SubMConv3d":
            if tuple(self.kernel_size) != (3, 3, 3):
                rulebook = None  # rulebooks are built for 3x3x3 kernels
            # remat: don't keep the 27 gathered neighbor tensors alive for
            # the backward pass (27x the activation memory) — regather.
            feats = jax.checkpoint(
                lambda f, ww: _vmap_subm(sp._replace(feats=f), ww,
                                         rulebook))(sp.feats, w)
            out = sp._replace(feats=feats)
        else:
            # checkpoint only the array pytree — the static grid tuple must
            # not round-trip through the transform (it would become traced)
            def _conv_arrays(f, ww):
                o = _vmap_sparse_conv(
                    sp._replace(feats=f), ww, tuple(self.stride),
                    tuple(self.padding),
                    self.out_cap or sp.feats.shape[-2])
                return o.feats, o.coords, o.ids, o.mask

            pad = _pad3(self.padding)
            stride = _pad3(self.stride)
            out_grid = tuple(
                (sp.grid[d] + 2 * pad[d] - self.kernel_size[d])
                // stride[d] + 1 for d in range(3))
            f, c, i, m = jax.checkpoint(_conv_arrays)(sp.feats, w)
            out = SparseGrid(f, c, i, m, out_grid)
        x = out.feats
        if self.norm_cfg is not None:
            cfg = dict(self.norm_cfg)
            x = MaskedBatchNorm(
                momentum=float(cfg.get("momentum", 0.01)),
                epsilon=float(cfg.get("eps", 1e-3)),
                axis_name=self.axis_name if is_sync_norm(cfg) else None,
            )(x, out.mask, train=train)
        if self.with_act:
            x = nn.relu(x)
        x = jnp.where(out.mask[..., None], x, 0.0)
        return out._replace(feats=x)


class _SiteBasicBlock(nn.Module):
    """Residual block of two subm convs (`ops/sparse_block.py:199`)."""

    channels: int
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sp: SparseGrid, train: bool = False,
                 rulebook=None) -> SparseGrid:
        identity = sp.feats
        out = _SiteConvModule(self.channels, norm_cfg=self.norm_cfg,
                                with_act=True,
                                axis_name=self.axis_name)(
            sp, train=train, rulebook=rulebook)
        out = _SiteConvModule(self.channels, norm_cfg=self.norm_cfg,
                                with_act=False,
                                axis_name=self.axis_name)(
            out, train=train, rulebook=rulebook)
        x = nn.relu(out.feats + identity)
        x = jnp.where(out.mask[..., None], x, 0.0)
        return out._replace(feats=x)




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
        rulebook = _vmap_site_rulebook(sp)
        sp = _SiteConvModule(self.base_channels, norm_cfg=norm_cfg,
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
                    sp = _SiteConvModule(
                        out_ch, stride=(2, 2, 2), padding=_pad3(pads[j]),
                        conv_type="SparseConv3d", out_cap=cap_for(i),
                        norm_cfg=norm_cfg, name=name)(sp, train=train)
                    rulebook = _vmap_site_rulebook(sp)
                else:
                    sp = _SiteConvModule(
                        out_ch, padding=_pad3(pads[j]), norm_cfg=norm_cfg,
                        name=name)(sp, train=train, rulebook=rulebook)
            stages.append(sp)
            rulebooks.append(rulebook)

        # conv_out -> dense BEV (same as SparseEncoder)
        out = _SiteConvModule(
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
            x = _SiteConvModule(channels[0], norm_cfg=norm_cfg,
                                  name=f"decoder_conv{i}")(
                x, train=train, rulebook=rulebooks[n_enc - i])
            if x.grid != target.grid:
                x = _SparseInverseConvModule(
                    channels[1], norm_cfg=norm_cfg,
                    name=f"decoder_up{i}")(x, target, train=train)
            else:
                x = _SiteConvModule(channels[1], norm_cfg=norm_cfg,
                                      name=f"decoder_same{i}")(
                    x, train=train, rulebook=rb)
            merged = jnp.concatenate([x.feats, target.feats], -1)
            x = x._replace(feats=merged)
            x = _SiteConvModule(channels[-1], norm_cfg=norm_cfg,
                                  name=f"decoder_merge{i}")(
                x, train=train, rulebook=rb)
        return dict(spatial_features=spatial, seg_features=x.feats,
                    voxel_coors=coors, voxel_mask=voxel_mask)