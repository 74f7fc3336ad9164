"""SECOND-style sparse 3D conv encoder (TPU rulebook gather-GEMM).

Parity: `mmdet3d/models/middle_encoders/sparse_encoder.py:19` — conv_input
(SubM) -> 4 encoder stages (each non-first stage opens with a stride-2
SparseConv3d in 'conv_module' mode, or closes with one in 'basicblock'
mode with residual SparseBasicBlocks before it,
`sparse_encoder.py:142-216` / `mmdet3d/ops/sparse_block.py:199`) ->
conv_out (kernel (3,1,1), stride (2,1,1)) -> dense (B, H, W, C*D) BEV.

TPU-native: sparse tensors are fixed-capacity sorted-id buffers
(`ops/sparse.py`); every conv is K masked gathers + K dense matmuls on the
MXU; BatchNorm pools statistics over all valid voxels in the batch (and
across devices when sync, NaiveSyncBN1d parity).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import MIDDLE_ENCODERS
from ...ops.sparse import (SparseGrid, build_sparse_grid,
                           build_subm_rulebook, sparse_conv3d,
                           sparse_to_dense, subm_conv3d)
from ..layers import MaskedBatchNorm, is_sync_norm


def _vmap_rulebook(sp: SparseGrid, kernel_size=(3, 3, 3)):
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


class _SparseConvModule(nn.Module):
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


class _SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (`ops/sparse_block.py:199`)."""

    channels: int
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sp: SparseGrid, train: bool = False,
                 rulebook=None) -> SparseGrid:
        identity = sp.feats
        out = _SparseConvModule(self.channels, norm_cfg=self.norm_cfg,
                                with_act=True,
                                axis_name=self.axis_name)(
            sp, train=train, rulebook=rulebook)
        out = _SparseConvModule(self.channels, norm_cfg=self.norm_cfg,
                                with_act=False,
                                axis_name=self.axis_name)(
            out, train=train, rulebook=rulebook)
        x = nn.relu(out.feats + identity)
        x = jnp.where(out.mask[..., None], x, 0.0)
        return out._replace(feats=x)


def _pad3(p) -> Tuple[int, int, int]:
    return tuple(p) if isinstance(p, (tuple, list)) else (int(p),) * 3


@MIDDLE_ENCODERS.register_module()
class SparseEncoder(nn.Module):
    """Sparse voxel encoder producing a dense BEV map.

    Call: (voxel_features (B, V, C), coors (B, V, 3) zyx, voxel_mask (B, V))
    -> (B, ny, nx, C_out * nz_out) NHWC dense BEV.
    ``sparse_shape`` is (nz, ny, nx) like the reference (e.g. [41,1440,1440]).
    ``stage_cap_ratios`` scale the voxel capacity after each downsample.
    """

    in_channels: int = 5
    sparse_shape: Sequence[int] = (41, 1440, 1440)
    order: Tuple[str, ...] = ("conv", "norm", "act")
    norm_cfg: Optional[dict] = None
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Any = ((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Any = ((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    block_type: str = "conv_module"
    stage_cap_ratios: Sequence[float] = (1.0, 1.0, 0.75, 0.5)
    return_intermediate: bool = False
    compute_dtype: str = "float32"  # 'bfloat16' halves gather traffic
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxel_features: jnp.ndarray, coors: jnp.ndarray,
                 voxel_mask: jnp.ndarray, train: bool = False):
        norm_cfg = dict(self.norm_cfg or
                        dict(type="BN1d", eps=1e-3, momentum=0.01))
        grid = tuple(int(g) for g in self.sparse_shape)
        v_cap = voxel_features.shape[1]
        voxel_features = voxel_features.astype(
            jnp.dtype(self.compute_dtype))

        def build(f, c, m):
            return build_sparse_grid(f, c, m, grid, assume_sorted=True)

        sp = jax.vmap(build)(voxel_features, coors, voxel_mask)
        sp = SparseGrid(sp.feats, sp.coords, sp.ids, sp.mask, grid)

        # one subm rulebook per active-site set (recomputed only after a
        # strided conv changes the sites) — neighbor search is the dominant
        # cost, the convs themselves are gather+GEMM.
        rulebook = _vmap_rulebook(sp)
        sp = _SparseConvModule(self.base_channels, norm_cfg=norm_cfg,
                               axis_name=self.axis_name,
                               name="conv_input")(sp, train=train,
                                                  rulebook=rulebook)

        def cap_for(stage: int) -> int:
            r = self.stage_cap_ratios[min(stage,
                                          len(self.stage_cap_ratios) - 1)]
            return max(int(v_cap * r) // 8 * 8, 8)

        encode_features = [sp]
        in_ch = self.base_channels
        for i, blocks in enumerate(self.encoder_channels):
            blocks = tuple(blocks)
            pads = tuple(self.encoder_paddings[i])
            for j, out_ch in enumerate(blocks):
                pad = _pad3(pads[j])
                name = f"encoder_layer{i + 1}_{j}"
                if i != 0 and j == 0 and self.block_type == "conv_module":
                    sp = _SparseConvModule(
                        out_ch, stride=(2, 2, 2), padding=pad,
                        conv_type="SparseConv3d", out_cap=cap_for(i),
                        norm_cfg=norm_cfg, axis_name=self.axis_name,
                        name=name)(sp, train=train)
                    rulebook = _vmap_rulebook(sp)
                elif self.block_type == "basicblock":
                    if j == len(blocks) - 1 and \
                            i != len(self.encoder_channels) - 1:
                        sp = _SparseConvModule(
                            out_ch, stride=(2, 2, 2), padding=pad,
                            conv_type="SparseConv3d", out_cap=cap_for(i + 1),
                            norm_cfg=norm_cfg, axis_name=self.axis_name,
                            name=name)(sp, train=train)
                        rulebook = _vmap_rulebook(sp)
                    else:
                        if in_ch != out_ch:
                            sp = _SparseConvModule(
                                out_ch, norm_cfg=norm_cfg,
                                axis_name=self.axis_name,
                                name=name + "_proj")(sp, train=train,
                                                     rulebook=rulebook)
                        sp = _SparseBasicBlock(
                            out_ch, norm_cfg=norm_cfg,
                            axis_name=self.axis_name, name=name)(
                                sp, train=train, rulebook=rulebook)
                else:
                    sp = _SparseConvModule(
                        out_ch, padding=pad, norm_cfg=norm_cfg,
                        axis_name=self.axis_name, name=name)(
                            sp, train=train, rulebook=rulebook)
                in_ch = out_ch
            encode_features.append(sp)

        out = _SparseConvModule(
            self.output_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1),
            padding=(0, 0, 0), conv_type="SparseConv3d",
            out_cap=cap_for(len(self.encoder_channels) - 1),
            norm_cfg=norm_cfg, axis_name=self.axis_name,
            name="conv_out")(sp, train=train)

        grid_out = out.grid
        dense = jax.vmap(lambda f, c, i, m: sparse_to_dense(
            SparseGrid(f, c, i, m, grid_out)))(
                out.feats, out.coords, out.ids, out.mask)
        b = dense.shape[0]
        nz, ny, nx, ch = dense.shape[1:]
        # (B, D, H, W, C) -> (B, H, W, C*D): N,C*D,H,W in the reference
        # (`sparse_encoder.py:135-137`) == channels-last concat of depth.
        dense = dense.transpose(0, 2, 3, 1, 4).reshape(b, ny, nx, nz * ch)
        if self.return_intermediate:
            return dense, encode_features
        return dense
