"""Host-side structure precompute ("plan") for the sparse encoder.

Every integer-structure computation in the voxelize -> column-engine
path — point->voxel binning, unique column tables, x-dilation tables,
subm/strided rulebooks — is a pure function of point COORDINATES, not of
features. On TPU these computations lower to sorts and sort-based
searchsorted calls that measured ~200 ms/sample of the flagship encoder
(stage_profile.py: dilate sorts alone 138 ms; each strided conv ~35 ms
of unique+searchsorted). A production TPU input pipeline computes such
structure on the HOST, overlapped with device compute of the previous
batch — exactly how the reference's dataloader workers overlap
augmentation (`mmdet3d/apis/train.py:66-75`, workers_per_gpu=6).

This module provides numpy mirrors with IDENTICAL semantics (same
ascending-id unique with lowest-ids-win capacity truncation, same
clamped searchsorted misses) and a `build_encoder_plan` that walks the
same stage sequence as `SparseEncoder` from a config dict. The device
ops accept the plan arrays and skip their sort paths; with no plan they
compute structure on device as before (tests, non-flagship configs).

Parity: `tests/test_ops/test_host_plan.py` asserts plan-vs-device
structure equality and planned-vs-unplanned encoder output equality.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

INT_MAX = np.iinfo(np.int32).max


def _unique_capped(ids: np.ndarray, cap: int) -> Tuple[np.ndarray,
                                                       np.ndarray]:
    """Sorted unique with INT_MAX padding and lowest-ids-win cap
    (mirrors ops/sparse.unique_sorted_ids)."""
    u = np.unique(ids)
    u = u[u != INT_MAX][:cap]
    out = np.full((cap,), INT_MAX, np.int32)
    out[:u.shape[0]] = u
    return out, out != INT_MAX


def _searchsorted_clamped(table: np.ndarray, q: np.ndarray,
                          cap: int) -> np.ndarray:
    return np.minimum(np.searchsorted(table, q), cap - 1).astype(np.int32)


def voxel_plan(points: np.ndarray, point_mask: np.ndarray,
               point_cloud_range: Sequence[float],
               voxel_size: Sequence[float],
               max_voxels: int) -> Dict[str, np.ndarray]:
    """Mirror of ops/voxel.voxelize_dynamic: per-point voxel slot +
    dense voxel table (ascending linear-id order, lowest ids kept)."""
    pcr = [float(v) for v in point_cloud_range]
    vs = [float(v) for v in voxel_size]
    nx = int(round((pcr[3] - pcr[0]) / vs[0]))
    ny = int(round((pcr[4] - pcr[1]) / vs[1]))
    nz = int(round((pcr[5] - pcr[2]) / vs[2]))
    xyz = points[:, :3].astype(np.float32)
    # reciprocal computed exactly like the device op (ops/voxel.py:50):
    # float64 Python division rounded once to float32 — np.float32
    # reciprocal of a float32 differs by 1 ulp for some sizes and can
    # flip floor() on voxel-boundary points (ADVICE r4)
    cxyz = np.floor(
        (xyz - np.array(pcr[:3], np.float32)) *
        np.array([1.0 / v for v in vs], np.float32)).astype(np.int32)
    in_range = np.all((cxyz >= 0) & (cxyz < np.array([nx, ny, nz])),
                      axis=-1)
    valid = point_mask.astype(bool) & in_range
    coors = np.stack([cxyz[:, 2], cxyz[:, 1], cxyz[:, 0]], axis=-1)
    # int32 ids throughout: a mixed int32-table/int64-query searchsorted
    # silently promotes (copies) the table per call — measured ~20 ms per
    # call at 250k points on the bench host
    assert nz * ny * nx < INT_MAX, "grid too large for int32 linear ids"
    ids = np.where(valid,
                   coors[:, 0] * (ny * nx) + coors[:, 1] * nx + coors[:, 2],
                   INT_MAX).astype(np.int32)
    uids, umask = _unique_capped(ids, max_voxels)
    slot = _searchsorted_clamped(uids, ids, max_voxels)
    keep = valid & (uids[slot] == ids)
    vidx = np.where(keep, slot, max_voxels).astype(np.int32)
    vox_coors = np.full((max_voxels, 3), -1, np.int32)
    vz = uids[umask] // (ny * nx)
    vy = (uids[umask] // nx) % ny
    vx = uids[umask] % nx
    vox_coors[:umask.sum()] = np.stack([vz, vy, vx], axis=-1)
    return dict(vidx=vidx, pmask=keep,
                vox_coors=vox_coors, vmask=umask,
                num_voxels=np.int32(np.unique(ids[ids != INT_MAX]).size))


def pillar_plan(points: np.ndarray, point_mask: np.ndarray,
                point_cloud_range: Sequence[float],
                voxel_size: Sequence[float], max_points: int,
                max_voxels: int) -> Dict[str, np.ndarray]:
    """Mirror of ops/voxel.voxelize_hard's structure: per-point pillar
    slot + in-pillar rank (ascending original order within a pillar,
    the reference's deterministic=True contract), pillar coords/mask/
    counts."""
    pcr = [float(v) for v in point_cloud_range]
    vs = [float(v) for v in voxel_size]
    nx = int(round((pcr[3] - pcr[0]) / vs[0]))
    ny = int(round((pcr[4] - pcr[1]) / vs[1]))
    nz = int(round((pcr[5] - pcr[2]) / vs[2]))
    xyz = points[:, :3].astype(np.float32)
    # device-matching reciprocal (see voxel_plan)
    cxyz = np.floor(
        (xyz - np.array(pcr[:3], np.float32)) *
        np.array([1.0 / v for v in vs], np.float32)).astype(np.int32)
    in_range = np.all((cxyz >= 0) & (cxyz < np.array([nx, ny, nz])),
                      axis=-1)
    valid = point_mask.astype(bool) & in_range
    coors = np.stack([cxyz[:, 2], cxyz[:, 1], cxyz[:, 0]], axis=-1)
    assert nz * ny * nx < INT_MAX, "grid too large for int32 linear ids"
    ids = np.where(valid,
                   coors[:, 0] * (ny * nx) + coors[:, 1] * nx + coors[:, 2],
                   INT_MAX).astype(np.int32)
    uids, umask = _unique_capped(ids, max_voxels)
    slot = _searchsorted_clamped(uids, ids, max_voxels)
    found = valid & (uids[slot] == ids)
    # rank = position among same-id points in original order
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    is_start = np.concatenate([[True], sorted_ids[1:] != sorted_ids[:-1]])
    pos = np.arange(ids.shape[0])
    start_pos = np.maximum.accumulate(np.where(is_start, pos, -1))
    rank_sorted = pos - start_pos
    rank = np.empty_like(pos)
    rank[order] = rank_sorted
    keep = found & (rank < max_points)
    vidx = np.where(keep, slot, max_voxels).astype(np.int32)
    rank = np.where(keep, rank, 0).astype(np.int32)
    group_size = np.zeros(max_voxels + 1, np.int32)
    np.add.at(group_size, np.where(found, slot, max_voxels), 1)
    num_points = np.minimum(group_size[:max_voxels], max_points)
    vox_coors = np.full((max_voxels, 3), -1, np.int32)
    vz = uids[umask] // (ny * nx)
    vy = (uids[umask] // nx) % ny
    vx = uids[umask] % nx
    vox_coors[:umask.sum()] = np.stack([vz, vy, vx], axis=-1)
    return dict(vidx=vidx, rank=rank, pmask=keep, vox_coors=vox_coors,
                vmask=umask, num_points=num_points)


def column_plan(vox_coors: np.ndarray, vmask: np.ndarray,
                grid: Sequence[int], col_cap: int,
                z_pad_to: int = 1, z_lo: int = 0,
                z_width: int = 0) -> Dict[str, np.ndarray]:
    """Mirror of sparse_cols.build_column_grid: column table + per-voxel
    flat scatter slot (slot * nz_padded + z; trash = col_cap * nz).
    ``(z_lo, z_width)`` mirror the device op's z WINDOW: the z_lo
    subtraction is baked into vox_slot (window-relative), voxels outside
    go to the trash slot — but the column table still counts them (a
    column whose voxels all fall outside keeps its slot, empty zmask)."""
    nz, ny, nx = (int(g) for g in grid)
    if z_width:
        nz = int(z_width)
    else:
        z_lo = 0
        nz = -(-nz // int(z_pad_to)) * int(z_pad_to)
    bev_ids = np.where(vmask,
                       vox_coors[:, 1] * nx + vox_coors[:, 2],
                       INT_MAX).astype(np.int32)
    col_ids, cmask = _unique_capped(bev_ids, col_cap)
    slot = _searchsorted_clamped(col_ids, bev_ids, col_cap)
    zw = vox_coors[:, 0] - int(z_lo)
    found = vmask & (col_ids[slot] == bev_ids) & (zw >= 0) & (zw < nz)
    flat = np.where(found, slot * nz + zw,
                    col_cap * nz).astype(np.int32)
    return dict(col_ids=col_ids, cmask=cmask, vox_slot=flat)


def dilate_plan(col_ids: np.ndarray, cmask: np.ndarray, ny: int, nx: int,
                dil_cap: int) -> Dict[str, np.ndarray]:
    """Mirror of sparse_cols.dilate_columns (+subm_y_rulebook): dilated
    table, embed slots, y+-1 rulebook."""
    x = col_ids % nx
    y = col_ids // nx
    cand = np.concatenate([
        np.where(cmask & (x > 0), col_ids - 1, INT_MAX),
        np.where(cmask, col_ids, INT_MAX),
        np.where(cmask & (x + 1 < nx), col_ids + 1, INT_MAX),
    ]).astype(np.int32)
    dil_ids, dil_cmask = _unique_capped(cand, dil_cap)
    embed = _searchsorted_clamped(
        dil_ids, np.where(cmask, col_ids, INT_MAX), dil_cap)
    ok = cmask & (dil_ids[embed] == col_ids)
    embed_slot = np.where(ok, embed, dil_cap).astype(np.int32)
    # columns dropped by dilation-capacity overflow lose their features
    # on the dilated table (the conv's input), so they spawn no strided
    # outputs either — the walk must thread `kept` into strided_plan
    # y rulebook on the DILATED table
    dy_ = dil_ids // nx
    qs = np.stack([
        np.where(dil_cmask & (dy_ > 0), dil_ids - nx, -1),
        np.where(dil_cmask & (dy_ + 1 < ny), dil_ids + nx, -1),
    ]).astype(np.int32)
    j = _searchsorted_clamped(dil_ids, qs.reshape(-1),
                              dil_ids.shape[0]).reshape(qs.shape)
    y_found = (qs >= 0) & (dil_ids[j] == qs)
    return dict(dil_ids=dil_ids, dil_cmask=dil_cmask,
                embed_slot=embed_slot, y_slots=j, y_found=y_found,
                kept=ok)


def strided_plan(active_ids: np.ndarray, active_cmask: np.ndarray,
                 table_ids: np.ndarray, ny: int,
                 nx: int, stride: Tuple[int, int], padding: Tuple[int, int],
                 out_cap: int, ky: int = 3, kx: int = 3
                 ) -> Dict[str, np.ndarray]:
    """Mirror of sparse_cols.sparse_conv_col_dil's BEV structure: output
    column table + the per-ky center-column taps.

    Output candidates spawn only from ACTIVE columns (the device op's
    `cmask & any(zmask)` — pure x-dilation slots hold no sites and spawn
    nothing; every column of the undilated active table carries at least
    one site, so `active_ids`/`active_cmask` is that set exactly). Tap
    lookups search the conv's input table (`table_ids`, the dilated
    one)."""
    sy, sx = (int(s) for s in stride)
    py, px = (int(p) for p in padding)
    ny_o = (ny + 2 * py - ky) // sy + 1
    nx_o = (nx + 2 * px - kx) // sx + 1
    y = active_ids // nx
    x = active_ids % nx
    cand = []
    for qy in range(-(-ky // sy)):
        for qx in range(-(-kx // sx)):
            by = (y + py) // sy - qy
            bx = (x + px) // sx - qx
            k_y = y + py - by * sy
            k_x = x + px - bx * sx
            ok = active_cmask & (k_y >= 0) & (k_y < ky) & (k_x >= 0) & \
                (k_x < kx) & (by >= 0) & (by < ny_o) & (bx >= 0) & \
                (bx < nx_o)
            cand.append(np.where(ok, by * nx_o + bx, INT_MAX))
    out_ids, out_cmask = _unique_capped(
        np.concatenate(cand).astype(np.int32), out_cap)
    yo = out_ids // nx_o
    xo = out_ids % nx_o
    xc = xo * sx - px + 1
    qs, oks = [], []
    for ky_ in range(ky):
        yi = yo * sy - py + ky_
        ok = out_cmask & (yi >= 0) & (yi < ny) & (xc >= 0) & (xc < nx)
        qs.append(np.where(ok, yi * nx + xc, -1))
        oks.append(ok)
    q = np.stack(qs).astype(np.int32)
    j = _searchsorted_clamped(table_ids, q.reshape(-1),
                              table_ids.shape[0]).reshape(q.shape)
    found = np.stack(oks) & (table_ids[j] == q)
    return dict(out_ids=out_ids, out_cmask=out_cmask,
                tap_j=j, tap_found=found)


def build_encoder_plan(points: np.ndarray, point_mask: np.ndarray,
                       voxel_layer: Dict, encoder_cfg: Dict,
                       max_voxels: int,
                       pillar_cfg: Optional[Dict] = None
                       ) -> Dict[str, np.ndarray]:
    """Walk the SparseEncoder's sparse-stage sequence (same caps, same
    dilation ratio, same dense_from_stage cutover) and emit every
    structure array the device path needs, as one flat dict.

    ``encoder_cfg`` is the config's pts_middle_encoder dict;
    ``max_voxels`` the voxelizer capacity (encoder v_cap).
    ``pillar_cfg`` (optional) adds the ISFusion pillarizer structure as
    `pil_*` keys: dict(voxel_size=(3,), max_points=int, max_voxels=int)
    — pillar voxel_size is the detector's `_pillar_size()`."""
    vp = voxel_plan(points, point_mask, voxel_layer["point_cloud_range"],
                    voxel_layer["voxel_size"], max_voxels)
    grid = tuple(int(g) for g in encoder_cfg.get("sparse_shape",
                                                 (41, 1440, 1440)))
    ratios = tuple(encoder_cfg.get("stage_cap_ratios",
                                   (1.0, 1.0, 0.5, 0.25)))
    dil_ratio = float(encoder_cfg.get("dilation_ratio", 1.6))
    dil_ratios = encoder_cfg.get("dilation_ratios")
    z_windows = encoder_cfg.get("z_windows")
    dense_from = int(encoder_cfg.get("dense_from_stage", 99))
    z_pad_to = int(encoder_cfg.get("z_pad_to", 8))
    enc_ch = encoder_cfg.get(
        "encoder_channels",
        ((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)))
    enc_pad = encoder_cfg.get(
        "encoder_paddings", ((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1)))
    block_type = encoder_cfg.get("block_type", "conv_module")
    v_cap = int(max_voxels)

    def cap_for(stage):
        r = ratios[min(stage, len(ratios) - 1)]
        return max(int(v_cap * r) // 8 * 8, 8)

    def dil_cap_for(stage):
        r = dil_ratio
        if dil_ratios is not None and stage < len(dil_ratios):
            r = dil_ratios[stage]
        return max(int(cap_for(stage) * float(r)) // 8 * 8, 8)

    plan = dict(vp)
    if pillar_cfg is not None:
        # the device pillarizer bins with the MODEL-level pc_range
        # (ISFusionDetector.pc_range), which may differ from the voxel
        # layer's range in exotic configs (ADVICE r4)
        pp = pillar_plan(points, point_mask,
                         pillar_cfg.get("point_cloud_range",
                                        voxel_layer["point_cloud_range"]),
                         pillar_cfg["voxel_size"],
                         int(pillar_cfg["max_points"]),
                         int(pillar_cfg["max_voxels"]))
        for k, v in pp.items():
            plan[f"pil_{k}"] = v
    nz, ny, nx = grid
    win0 = None
    if z_windows is not None and len(z_windows) > 0:
        win0 = z_windows[0]
    cp = column_plan(vp["vox_coors"], vp["vmask"], grid, cap_for(0),
                     z_pad_to=z_pad_to,
                     z_lo=int(win0[0]) if win0 else 0,
                     z_width=int(win0[1]) if win0 else 0)
    plan.update(cp)
    ids, cmask = cp["col_ids"], cp["cmask"]
    cur_ny, cur_nx = ny, nx

    if dense_from <= 0:
        return plan
    dp = dilate_plan(ids, cmask, cur_ny, cur_nx, dil_cap_for(0))
    for k, v in dp.items():
        plan[f"s0_{k}"] = v

    n_stages = len(enc_ch)
    z_true = nz
    for i in range(n_stages):
        blocks = tuple(enc_ch[i])
        pads = tuple(enc_pad[i])
        if dense_from <= i + 1:
            break
        for j_, _out_ch in enumerate(blocks):
            pad = pads[j_]
            pad3 = tuple(pad) if isinstance(pad, (tuple, list)) \
                else (int(pad),) * 3
            is_strided = (
                (i != 0 and j_ == 0 and block_type == "conv_module") or
                (block_type == "basicblock" and j_ == len(blocks) - 1 and
                 i != n_stages - 1))
            if not is_strided:
                continue
            # The plan treats every kept column as a spawner; the device
            # uses `cmask & any(zmask)`. These agree only when the
            # strided z conv covers every true input z cell (a column
            # cannot go zmask-empty through the conv). Insufficient z
            # padding breaks that — fail loudly (ADVICE r4).
            z_out = (z_true + 2 * pad3[0] - 3) // 2 + 1
            assert all(
                any((z + pad3[0] - dz) % 2 == 0 and
                    0 <= (z + pad3[0] - dz) // 2 < z_out
                    for dz in range(3)) for z in range(z_true)), (
                f"sparse strided stage z padding {pad3[0]} leaves input "
                f"z cells of extent {z_true} uncovered — host plan "
                f"spawner set would diverge from the device's")
            out_stage = i if block_type == "conv_module" else i + 1
            sp = strided_plan(
                ids, cmask & dp["kept"], dp["dil_ids"], cur_ny, cur_nx,
                (2, 2), pad3[1:], cap_for(out_stage))
            for k, v in sp.items():
                if k != "kept":
                    plan[f"str{out_stage}_{k}"] = v
            ids, cmask = sp["out_ids"], sp["out_cmask"]
            cur_ny = (cur_ny + 2 * pad3[1] - 3) // 2 + 1
            cur_nx = (cur_nx + 2 * pad3[2] - 3) // 2 + 1
            z_true = z_out
            # emit the dilate plan for every stage that still runs subm
            # blocks on the sparse engine — including the FINAL stage
            # (the r4 walk skipped it, silently forfeiting its planned
            # sorts for non-dense-cutover configs, ADVICE r4); skip only
            # past the dense cutover
            if dense_from <= out_stage + 1:
                dp = None
            else:
                dp = dilate_plan(ids, cmask, cur_ny, cur_nx,
                                 dil_cap_for(out_stage))
                for k, v in dp.items():
                    plan[f"s{out_stage}_{k}"] = v
        if dp is None:
            break
    return plan


def make_plan_fn(model_cfg: Dict, train: bool):
    """Collate-time plan enricher from a detector config dict.

    Returns a callable ``fn(batch) -> batch`` that adds a
    ``batch["sparse_plan"]`` computed from the (augmented) padded point
    clouds, or ``None`` when the model has no column-engine
    SparseEncoder (the device then computes structure itself). The
    train/test APIs install it on the DataLoader so the numpy sorts run
    in the prefetch worker, overlapped with the device step — the
    reference overlaps its augmentation work the same way
    (`mmdet3d/apis/train.py:66-75`, workers_per_gpu=6).
    """
    mc = dict(model_cfg)
    if mc.get("type") != "ISFusionDetector":
        # only the ISFusion forward consumes batch["sparse_plan"] today;
        # other families would pay the host compute + transfer for nothing
        return None
    enc = dict(mc.get("pts_middle_encoder") or {})
    if enc.get("type") != "SparseEncoder" or \
            enc.get("engine", "columns") != "columns":
        return None
    vl = dict(mc.get("pts_voxel_layer") or {})
    if "point_cloud_range" not in vl or "voxel_size" not in vl:
        return None

    def _cap(mv, default):
        if mv is None:
            mv = default
        if isinstance(mv, (tuple, list)):
            mv = mv[0] if train else mv[1]
        return int(mv)

    cap = _cap(vl.get("max_voxels"), 120000)
    if cap <= 0:
        cap = 120000
    pillar_cfg = None
    if mc.get("type") == "ISFusionDetector":
        vs = list(mc["voxel_size"])
        pcr = list(mc["pc_range"])
        osf = int(mc.get("out_size_factor", 8))
        fe = dict(mc.get("fusion_encoder") or {})
        pillar_cfg = dict(
            voxel_size=(vs[0] * osf, vs[1] * osf, pcr[5] - pcr[2]),
            point_cloud_range=pcr,
            max_points=int(fe.get("num_points_in_pillar", 12)),
            max_voxels=_cap(mc.get("pillar_max_voxels", (30000, 60000)),
                            (30000, 60000)))

    def fn(batch: Dict) -> Dict:
        if "points" not in batch or "points_mask" not in batch:
            return batch
        batch["sparse_plan"] = build_encoder_plan_batch(
            np.asarray(batch["points"]), np.asarray(batch["points_mask"]),
            vl, enc, cap, pillar_cfg)
        return batch

    return fn


def build_encoder_plan_batch(points: np.ndarray, point_mask: np.ndarray,
                             voxel_layer: Dict, encoder_cfg: Dict,
                             max_voxels: int,
                             pillar_cfg: Optional[Dict] = None
                             ) -> Dict[str, np.ndarray]:
    """Batched wrapper: stacks per-sample plans along a leading axis."""
    plans = [build_encoder_plan(np.asarray(points[b]),
                                np.asarray(point_mask[b]), voxel_layer,
                                encoder_cfg, max_voxels, pillar_cfg)
             for b in range(points.shape[0])]
    return {k: np.stack([p[k] for p in plans]) for k in plans[0]}
