"""SECOND-style sparse 3D conv encoder on the column-sparse TPU engine.

Parity: `mmdet3d/models/middle_encoders/sparse_encoder.py:19` — conv_input
(SubM) -> 4 encoder stages (basicblock mode closes each non-final stage
with a stride-2 SparseConv3d after residual SparseBasicBlocks,
`sparse_encoder.py:142-216` / `mmdet3d/ops/sparse_block.py:199`) ->
conv_out (kernel (3,1,1), stride (2,1,1)) -> dense (B, H, W, C*D) BEV.

TPU-native: sparse tensors are BEV-sparse / z-dense column tables
(`ops/sparse_cols.py`) — a 3^3 kernel costs 6 fat-row gathers + 9 dense
z-convs on the MXU instead of 27 per-site gathers (see that module's
docstring for the design rationale and measured motivation). BatchNorm
pools statistics over all valid sites in the batch (and across devices
when sync — NaiveSyncBN1d parity, `mmdet3d/ops/norm.py:137`).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import MIDDLE_ENCODERS
from ...ops.sparse_cols import (ColumnGrid, build_column_grid,
                                build_column_grid_planned, column_to_dense,
                                dilate_columns, dilate_columns_planned,
                                dilate_columns_subm,
                                dilate_columns_subm_planned, expand_columns,
                                sparse_conv_col, sparse_conv_col_dil,
                                subm_conv_col_dil, zconv_col)
from ...ops.sparse_dense import (DenseGrid, columns_to_dense, dense_to_bev,
                                 sparse_conv_dense, subm_conv_dense)
from ..layers import MaskedBatchNorm, is_sync_norm


def _vmap_cols(fn, cg: ColumnGrid, *extra):
    """vmap a per-sample ColumnGrid function over the leading batch axis
    (``bev`` is static pytree metadata, so the grid maps whole)."""
    return jax.vmap(fn)(cg, *extra)


def _vmap_dilate(cg: ColumnGrid, dil_cap: int, plan=None):
    """Batched x-dilation; returns (dilated ColumnGrid, y-rulebook).
    With a host plan slice the sorts are precomputed
    (`ops/host_plan.dilate_plan`)."""
    if plan is not None:
        return jax.vmap(dilate_columns_planned)(cg, plan)
    return jax.vmap(lambda g: dilate_columns(g, dil_cap))(cg)


_DIL_KEYS = ("dil_ids", "dil_cmask", "embed_slot", "y_slots", "y_found")
_SUBDIL_KEYS = ("dil_ids", "dil_cmask", "sub_ids", "sub_cmask",
                "sub_embed", "sub_y_slots", "sub_y_found",
                "exp_slot", "exp_found")
_STR_KEYS = ("out_ids", "out_cmask", "tap_j", "tap_found")


def _plan_slice(plan, prefix: str, keys):
    """Extract `{prefix}_{key}` entries of a host plan as a sub-dict.

    A stage with NO entries is legitimate (the host walk stops at the
    dense cutover — its strided conv runs on a DenseGrid and ignores the
    plan); a PARTIAL stage means the plan/config walks diverged — loud."""
    if plan is None:
        return None
    missing = [k for k in keys if f"{prefix}_{k}" not in plan]
    if len(missing) == len(keys):
        return None
    assert not missing, \
        f"host plan lacks {prefix}_{{{missing}}} — plan/config walk mismatch"
    return {k: plan[f"{prefix}_{k}"] for k in keys}


def _pad3(p) -> Tuple[int, int, int]:
    return tuple(p) if isinstance(p, (tuple, list)) else (int(p),) * 3


def check_window_coverage(z_log_in: int, lo_in: int, w_in: int, pz: int,
                          z_log_out: int, lo_out: int, w_out: int,
                          name: str, sz: int = 2, kz: int = 3) -> None:
    """Static exactness check for a strided conv between z windows.

    The build/window contract is "no active site outside the window", so
    the conv stays EXACT iff every legal output of every in-window input
    cell lands inside the output window — otherwise output sites the
    reference engine would create are silently dropped. Evaluated at
    trace time over the <=48-cell extent (shared by the host plan walk's
    spawner reasoning: in-window inputs always spawn in-window outputs)."""
    for z in range(lo_in, min(lo_in + w_in, z_log_in)):
        for dz in range(kz):
            if (z + pz - dz) % sz != 0:
                continue
            zo = (z + pz - dz) // sz
            if 0 <= zo < z_log_out:
                assert lo_out <= zo < lo_out + w_out, (
                    f"{name}: in-window input z={z} produces output "
                    f"z={zo} outside the output window [{lo_out}, "
                    f"{lo_out + w_out}) — widen the window or move its "
                    "base (z_windows config)")


class _SparseConvModule(nn.Module):
    """conv(+norm)(+act) on a ColumnGrid — make_sparse_convmodule parity."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    conv_type: str = "SubMConv3d"
    out_cap: Optional[int] = None
    norm_cfg: Optional[dict] = None
    with_act: bool = True
    axis_name: Optional[str] = None
    # z-window plumbing for strided convs (see ops/sparse_cols.py
    # _zconv_shift): z_shift = sz*z_lo_out - z_lo_in - pz; out_zlen the
    # output window width. None/0 = plain padded conv.
    z_shift: Optional[int] = None
    out_zlen: int = 0

    @nn.compact
    def __call__(self, cg, train: bool = False, rulebook=None,
                 str_plan=None):
        cin = cg.feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            tuple(self.kernel_size) + (cin, self.out_channels), jnp.float32)
        if isinstance(cg, DenseGrid):
            out = self._dense_conv(cg, w)
        elif self.conv_type == "SubMConv3d":
            assert rulebook is not None, \
                "subm convs run on a dilated grid (see _vmap_dilate)"
            # remat: regather neighbors in backward instead of keeping the
            # tap tensors alive.
            feats = jax.checkpoint(lambda f, ww: jax.vmap(
                lambda g, rs, rf: subm_conv_col_dil(g, ww, (rs, rf)))(
                    cg.replace(feats=f), *rulebook))(cg.feats, w)
            out = cg.replace(feats=feats)
        elif tuple(self.kernel_size)[1:] == (1, 1):
            sz = self.stride[0] if isinstance(self.stride,
                                              (tuple, list)) else self.stride
            pz = _pad3(self.padding)[0]

            def _conv(f, ww):
                o = _vmap_cols(lambda g: zconv_col(g, ww, int(sz), pz),
                               cg.replace(feats=f))
                return o.feats, o.zmask
            feats, zmask = jax.checkpoint(_conv)(cg.feats, w)
            out = ColumnGrid(feats, zmask, cg.ids, cg.cmask, cg.bev)
        else:
            stride = _pad3(self.stride)
            pad = _pad3(self.padding)
            out_cap = self.out_cap or cg.feats.shape[1]
            # the u-factorized path needs an x-dilated input and a 3x3 BEV
            # kernel; encoder downsamples qualify (their input stage grid
            # is always dilated), odd shapes fall back to the 9-tap form
            conv_fn = sparse_conv_col_dil if tuple(
                self.kernel_size)[1:] == (3, 3) else sparse_conv_col

            zkw = dict(z_shift=self.z_shift, out_zlen=self.out_zlen)
            if conv_fn is sparse_conv_col_dil and str_plan is not None:
                out = jax.checkpoint(
                    lambda f, ww: jax.vmap(
                        lambda g, pl: sparse_conv_col_dil(
                            g, ww, stride, pad, out_cap, pl, **zkw))(
                        cg.replace(feats=f), str_plan))(cg.feats, w)
            else:
                out = jax.checkpoint(
                    lambda f, ww: _vmap_cols(lambda g: conv_fn(
                        g, ww, stride, pad, out_cap, **zkw),
                        cg.replace(feats=f)))(cg.feats, w)
        x = out.feats
        if self.norm_cfg is not None:  # noqa: SIM108  (shared tail)
            cfg = dict(self.norm_cfg)
            x = MaskedBatchNorm(
                momentum=float(cfg.get("momentum", 0.01)),
                epsilon=float(cfg.get("eps", 1e-3)),
                axis_name=self.axis_name if is_sync_norm(cfg) else None,
            )(x, out.zmask, train=train)
        if self.with_act:
            x = nn.relu(x)
        x = jnp.where(out.zmask[..., None], x, 0.0).astype(cg.feats.dtype)
        return out.replace(feats=x)

    def _dense_conv(self, dg: DenseGrid, w) -> DenseGrid:
        """Dense-grid conv dispatch (exact spconv semantics; see
        ops/sparse_dense.py). SubM keeps the active set; everything else
        (strided downsamples, the z-only conv_out) recomputes the output
        mask via reduce_window."""
        if self.conv_type == "SubMConv3d":
            return jax.checkpoint(
                lambda f, ww: subm_conv_dense(dg.replace(feats=f), ww))(
                    dg.feats, w)
        stride = _pad3(self.stride)
        pad = _pad3(self.padding)
        return jax.checkpoint(
            lambda f, ww: sparse_conv_dense(dg.replace(feats=f), ww,
                                            stride, pad,
                                            z_shift=self.z_shift,
                                            out_zlen=self.out_zlen))(
                                                dg.feats, w)


class _SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (`ops/sparse_block.py:199`)."""

    channels: int
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, cg: ColumnGrid, train: bool = False,
                 rulebook=None) -> ColumnGrid:
        identity = cg.feats
        out = _SparseConvModule(self.channels, norm_cfg=self.norm_cfg,
                                with_act=True,
                                axis_name=self.axis_name)(
            cg, train=train, rulebook=rulebook)
        out = _SparseConvModule(self.channels, norm_cfg=self.norm_cfg,
                                with_act=False,
                                axis_name=self.axis_name)(
            out, train=train, rulebook=rulebook)
        x = nn.relu(out.feats + identity)
        x = jnp.where(out.zmask[..., None], x, 0.0).astype(cg.feats.dtype)
        return out.replace(feats=x)


@MIDDLE_ENCODERS.register_module()
class SparseEncoder(nn.Module):
    """Sparse voxel encoder producing a dense BEV map.

    Call: (voxel_features (B, V, C), coors (B, V, 3) zyx, voxel_mask (B, V))
    -> (B, ny, nx, C_out * nz_out) NHWC dense BEV.
    ``sparse_shape`` is (nz, ny, nx) like the reference (e.g. [41,1440,1440]).
    ``stage_cap_ratios`` scale the COLUMN capacity per stage (column count
    shrinks under BEV downsampling; z-cells ride inside columns for free).
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
    stage_cap_ratios: Sequence[float] = (1.0, 1.0, 0.5, 0.25)
    dilation_ratio: float = 1.6  # x-dilated column cap / column cap
    # per-stage overrides of dilation_ratio: the TRUE x-dilation factor
    # falls with depth (2.0 at stage 0, ~1.55 at stage 1 on ray-cast
    # nuScenes-scale clouds — ops/host_plan walk, round 5), and every
    # subm conv's cost is proportional to the dilated-table size
    dilation_ratios: Optional[Sequence[float]] = None
    # per-stage REFINED-dilation caps (x the column caps) for the subm
    # convs: the u-factorized subm conv consumes x-dilated-only columns
    # only through the y-combine of ACTIVE outputs, so its table needs
    # just active + {dilated-only with an active y+-1 neighbor} — 68% /
    # 80% of the full x-dilation at stages 0/1 at bench density
    # (micro_dilation_refine.py census: 168,333 / 131,440 columns).
    # The strided conv still reads the FULL dilation (every dilated-only
    # column has a strided consumer there), via one expand_columns
    # gather per stage. None = subm convs run on the full dilation.
    subm_dilation_ratios: Optional[Sequence[float]] = None
    # Per-stage static z WINDOWS ((z_lo, width) or None = full extent),
    # indexed by stage table (0 = conv_input + stage-1 blocks). LiDAR
    # scenes occupy a narrow global z band (ground .. max return height;
    # measured [15, 39] of 41 cells at stage 0, micro_zdist.py), so a
    # static window carries every site while cutting conv FLOPs and
    # gather traffic by width/z. Sites outside a window are dropped with
    # documented capacity semantics (see build_column_grid); window
    # transitions are checked exact at trace time (check_window_coverage).
    # The final sparse stage (feeding conv_out) must be un-windowed.
    z_windows: Optional[Any] = None
    return_intermediate: bool = False
    compute_dtype: str = "float32"  # 'bfloat16' halves gather traffic
    z_pad_to: int = 8   # lane-aligned gather rows (see build_column_grid)
    axis_name: Optional[str] = None
    # 'columns' is the only engine. A z-windowed alternative
    # (ops/sparse_win.py, rounds 3-4) was built, oracle-verified, and
    # measured 1544-1766 ms vs 681-942 ms whole-encoder at full scale
    # across three layout/shifter redesigns; it was deleted in round 4
    # (negative result recorded in PERF.md "window engine").
    engine: str = "columns"
    # Hybrid engine: encoder stages >= this number run as masked dense
    # XLA 3D convs (ops/sparse_dense.py) — exact spconv semantics, no
    # capacity caps, MXU-bound instead of gather-bound. Stage numbering:
    # 0 = dense from conv_input; k in [1, n_stages] = stage k's blocks on
    # (the strided conv INTO stage k stays on the sparse engine). 99 =
    # never. Occupancy rises with depth, so the measured crossover sits
    # at the deep stages (PERF.md round-4 table).
    dense_from_stage: int = 99

    @nn.compact
    def __call__(self, voxel_features: jnp.ndarray, coors: jnp.ndarray,
                 voxel_mask: jnp.ndarray, train: bool = False, plan=None,
                 return_after: Optional[str] = None):
        """``return_after`` (profiling only) returns the intermediate
        grid after the named step — 'build', 'dil0', 'conv_input',
        'L{stage}_{block}' — so a jitted prefix XLA-DCEs everything past
        it (tools/analysis_tools/encoder_profile.py)."""
        # 'columns' is the only engine (the z-window engine was deleted
        # in round 4); stale configs must fail loudly, not silently run
        # a different engine (ADVICE r4)
        assert self.engine == "columns", \
            f"unknown sparse engine {self.engine!r} ('columns' is the " \
            "only engine; 'window' was deleted in round 4)"
        norm_cfg = dict(self.norm_cfg or
                        dict(type="BN1d", eps=1e-3, momentum=0.01))
        grid = tuple(int(g) for g in self.sparse_shape)
        v_cap = voxel_features.shape[1]
        voxel_features = voxel_features.astype(
            jnp.dtype(self.compute_dtype))

        def cap_for(stage: int) -> int:
            r = self.stage_cap_ratios[min(stage,
                                          len(self.stage_cap_ratios) - 1)]
            return max(int(v_cap * r) // 8 * 8, 8)

        def dil_cap_for(stage: int) -> int:
            r = self.dilation_ratio
            if self.dilation_ratios is not None and \
                    stage < len(self.dilation_ratios):
                r = self.dilation_ratios[stage]
            return max(int(cap_for(stage) * float(r)) // 8 * 8, 8)

        def subm_cap_for(stage: int) -> Optional[int]:
            sr = self.subm_dilation_ratios
            if sr is None or stage >= len(sr) or sr[stage] is None:
                return None
            return max(int(cap_for(stage) * float(sr[stage])) // 8 * 8, 8)

        def dilate_stage(g, stage: int):
            """(subm grid, y-rulebook, expand-or-None) for a stage table.

            With a refined subm cap (subm_dilation_ratios) the stage's
            subm convs run on the smaller consumption-exact table and
            the returned expand dict re-embeds it into the full
            x-dilation right before the strided conv (expand_columns)."""
            s_cap = subm_cap_for(stage)
            if s_cap is None:
                g, rb = _vmap_dilate(
                    g, dil_cap_for(stage),
                    _plan_slice(plan, f"s{stage}", _DIL_KEYS))
                return g, rb, None
            pl = _plan_slice(plan, f"s{stage}", _SUBDIL_KEYS)
            if pl is not None:
                return jax.vmap(dilate_columns_subm_planned)(g, pl)
            return jax.vmap(lambda gg: dilate_columns_subm(
                gg, dil_cap_for(stage), s_cap))(g)

        n_stages = len(self.encoder_channels)
        dense_from = int(self.dense_from_stage)

        def win_of(stage: int):
            """(z_lo, width) of the stage's table, or None = full.

            Table t runs dense iff dense_from <= t + 1 (conversion fires
            at the loop-top `dense_from == i + 1` for conv_module and at
            `dense_from <= i + 2` in the basicblock strided branch).
            Windows apply to BOTH engines: sparse tables store only the
            window (build_column_grid); dense tables keep the window as
            their stored depth extent (columns_to_dense keep_window +
            sparse_conv_dense z_shift). A window on a table reached by a
            strided conv from a windowed table is structurally drop-free
            when it covers the strided image of the input window —
            checked exact at trace time (check_window_coverage). Only
            the final SPARSE table must stay un-windowed (conv_out's
            column form has no shift plumbing; its dense form does)."""
            if self.z_windows is None or stage >= len(self.z_windows):
                return None
            w = self.z_windows[stage]
            if w is None:
                return None
            if dense_from > stage + 1:          # sparse table
                assert stage < n_stages - 1, \
                    "the final sparse stage feeds conv_out un-windowed"
            return int(w[0]), int(w[1])

        win = win_of(0)
        if plan is not None:
            cg = jax.vmap(lambda f, pl: build_column_grid_planned(
                f, pl, grid, cap_for(0), z_pad_to=self.z_pad_to,
                z_width=win[1] if win else 0))(
                    voxel_features,
                    {k: plan[k] for k in ("col_ids", "cmask", "vox_slot")})
        else:
            cg = jax.vmap(lambda f, c, m: build_column_grid(
                f, c, m, grid, cap_for(0), z_pad_to=self.z_pad_to,
                z_lo=win[0] if win else 0,
                z_width=win[1] if win else 0))(voxel_features, coors,
                                               voxel_mask)
        if return_after == "build":
            return cg
        # logical z extent (the unpadded reference arithmetic): pad cells
        # ride along masked-off until the slice before conv_out, so the
        # dense BEV keeps the reference's exact C_out * nz_out channels
        z_log = grid[0]
        cur_lo = win[0] if win else 0   # current table's window base

        # each stage's subm convs run on the x-dilated column table; the
        # dilation + y-rulebook are rebuilt only after a strided conv
        # changes the BEV footprint (spconv indice_key reuse semantics).
        if dense_from <= 0:
            cg, rulebook, exp = columns_to_dense(
                cg, z_log, cur_lo, keep_window=True), None, None
        else:
            cg, rulebook, exp = dilate_stage(cg, 0)
        # block-level remat: each residual block's z-dense activations are
        # ~365 MB at stage-0 scale; saving every conv output OOMs the
        # 16 GB chip for the train step. nn.remat keeps only block inputs
        # and recomputes inside the block during backward. Skipped on the
        # CPU backend (virtual-device mesh dryruns): host RAM is not the
        # constraint there and lifted remat balloons XLA:CPU compile time.
        if return_after == "dil0":
            return cg
        block_cls = nn.remat(_SparseBasicBlock, static_argnums=(2,)) \
            if train and jax.default_backend() != "cpu" \
            else _SparseBasicBlock
        cg = _SparseConvModule(self.base_channels, norm_cfg=norm_cfg,
                               axis_name=self.axis_name,
                               name="conv_input")(cg, train=train,
                                                  rulebook=rulebook)

        if return_after == "conv_input":
            return cg
        encode_features = [cg]
        in_ch = self.base_channels

        def z_transition(t_out: int, pz: int):
            """(z_shift, out_zlen, lo_out) for the strided conv into
            stage table ``t_out`` (None/0/0 = plain padded conv on an
            un-windowed path). Works for both engines (the dense strided
            conv takes the same z_shift/out_zlen contract). Exactness of
            window transitions is checked statically
            (check_window_coverage)."""
            dense_in = isinstance(cg, DenseGrid)
            w_in = cg.feats.shape[1] if dense_in else cg.feats.shape[2]
            z_log_out = (z_log + 2 * pz - 3) // 2 + 1
            wout = win_of(t_out)
            if wout is None:
                if cur_lo == 0:
                    return None, 0, 0
                # windowed input -> full output (window ends): dense
                # emits the exact logical extent; columns round up for
                # lane-aligned gather rows
                zp = z_log_out if dense_in else -(-z_log_out // 4) * 4
                check_window_coverage(z_log, cur_lo, w_in,
                                      pz, z_log_out, 0, zp,
                                      f"strided into stage {t_out}")
                return -cur_lo - pz, zp, 0
            lo_out, wlen = wout
            check_window_coverage(z_log, cur_lo, w_in, pz,
                                  z_log_out, lo_out, wlen,
                                  f"strided into stage {t_out}")
            return 2 * lo_out - cur_lo - pz, wlen, lo_out

        for i, blocks in enumerate(self.encoder_channels):
            blocks = tuple(blocks)
            pads = tuple(self.encoder_paddings[i])
            if dense_from == i + 1 and not isinstance(cg, DenseGrid):
                cg, rulebook = columns_to_dense(cg, z_log, cur_lo,
                                                keep_window=True), None
            for j, out_ch in enumerate(blocks):
                pad = _pad3(pads[j])
                name = f"encoder_layer{i + 1}_{j}"
                if i != 0 and j == 0 and self.block_type == "conv_module":
                    if exp is not None:
                        cg, exp = jax.vmap(expand_columns)(cg, exp), None
                    zs, ozl, cur_lo = z_transition(i, pad[0])
                    cg = _SparseConvModule(
                        out_ch, stride=(2, 2, 2), padding=pad,
                        conv_type="SparseConv3d", out_cap=cap_for(i),
                        norm_cfg=norm_cfg, axis_name=self.axis_name,
                        z_shift=zs, out_zlen=ozl,
                        name=name)(cg, train=train, str_plan=_plan_slice(
                            plan, f"str{i}", _STR_KEYS))
                    z_log = (z_log + 2 * pad[0] - 3) // 2 + 1
                    if not isinstance(cg, DenseGrid):
                        cg, rulebook, exp = dilate_stage(cg, i)
                elif self.block_type == "basicblock":
                    if j == len(blocks) - 1 and \
                            i != len(self.encoder_channels) - 1:
                        if exp is not None:
                            cg, exp = jax.vmap(expand_columns)(cg, exp), \
                                None
                        zs, ozl, cur_lo = z_transition(i + 1, pad[0])
                        cg = _SparseConvModule(
                            out_ch, stride=(2, 2, 2), padding=pad,
                            conv_type="SparseConv3d", out_cap=cap_for(i + 1),
                            norm_cfg=norm_cfg, axis_name=self.axis_name,
                            z_shift=zs, out_zlen=ozl,
                            name=name)(cg, train=train,
                                       str_plan=_plan_slice(
                                           plan, f"str{i + 1}", _STR_KEYS))
                        z_log = (z_log + 2 * pad[0] - 3) // 2 + 1
                        if isinstance(cg, DenseGrid):
                            pass
                        elif dense_from <= i + 2:
                            # next stage is dense: convert now, skip the
                            # dilation rebuild entirely. The strided conv
                            # already emitted the dense table's z window
                            # (z_transition), which the dense grid keeps
                            # as its stored depth extent.
                            cg, rulebook = columns_to_dense(
                                cg, z_log, cur_lo, keep_window=True), None
                        else:
                            cg, rulebook, exp = dilate_stage(cg, i + 1)
                    else:
                        if in_ch != out_ch:
                            cg = _SparseConvModule(
                                out_ch, norm_cfg=norm_cfg,
                                axis_name=self.axis_name,
                                name=name + "_proj")(cg, train=train,
                                                     rulebook=rulebook)
                        cg = block_cls(
                            out_ch, norm_cfg=norm_cfg,
                            axis_name=self.axis_name, name=name)(
                                cg, train, rulebook)
                else:
                    cg = _SparseConvModule(
                        out_ch, padding=pad, norm_cfg=norm_cfg,
                        axis_name=self.axis_name, name=name)(
                            cg, train=train, rulebook=rulebook)
                in_ch = out_ch
                if return_after == f"L{i + 1}_{j}":
                    return cg
            encode_features.append(cg)

        if isinstance(cg, ColumnGrid) and \
                cg.feats.shape[2] != z_log:  # drop masked z-pad cells so the
            cg = cg.replace(feats=cg.feats[:, :, :z_log],   # dense BEV has
                            zmask=cg.zmask[:, :, :z_log])   # exact channels
        # conv_out always emits the FULL output extent (the dense BEV's
        # channel count is the reference's C_out * nz_out); a z-windowed
        # final dense table feeds it through the shifted-conv plumbing
        co_zs, co_ozl = None, 0
        if isinstance(cg, DenseGrid) and \
                (cur_lo != 0 or cg.feats.shape[1] < z_log):
            co_ozl = (z_log - 3) // 2 + 1
            co_zs = -cur_lo                 # sz*0 - lo_in - pz(=0)
        out = _SparseConvModule(
            self.output_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1),
            padding=(0, 0, 0), conv_type="SparseConv3d",
            norm_cfg=norm_cfg, axis_name=self.axis_name,
            z_shift=co_zs, out_zlen=co_ozl,
            name="conv_out")(cg, train=train)

        # (B, ny, nx, Z*C) with out[..., z*C:(z+1)*C] = feats[:, z] —
        # channels-last depth concat, matching the reference's
        # N,C*D,H,W (`sparse_encoder.py:135-137`).
        if isinstance(out, DenseGrid):
            dense = dense_to_bev(out)
        else:
            dense = _vmap_cols(column_to_dense, out)
        if self.return_intermediate:
            return dense, encode_features
        return dense
