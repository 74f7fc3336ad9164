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


def _y_rulebook(table_ids: np.ndarray, table_cmask: np.ndarray, ny: int,
                nx: int) -> Tuple[np.ndarray, np.ndarray]:
    """Mirror of sparse_cols.subm_y_rulebook on any sorted id table."""
    ty = table_ids // nx
    qs = np.stack([
        np.where(table_cmask & (ty > 0), table_ids - nx, -1),
        np.where(table_cmask & (ty + 1 < ny), table_ids + nx, -1),
    ]).astype(np.int32)
    j = _searchsorted_clamped(table_ids, qs.reshape(-1),
                              table_ids.shape[0]).reshape(qs.shape)
    return j, (qs >= 0) & (table_ids[j] == qs)


def dilate_plan(col_ids: np.ndarray, cmask: np.ndarray, ny: int, nx: int,
                dil_cap: int,
                subm_cap: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Mirror of sparse_cols.dilate_columns (+subm_y_rulebook): dilated
    table, embed slots, y+-1 rulebook. With ``subm_cap`` also mirrors
    dilate_columns_subm: the REFINED table the stage's subm convs run on
    (active columns + the x-dilated-only columns with an active y+-1
    neighbor — the exact consumption set of the u-factorization) plus
    the refined->full expand lookup the pre-strided `expand_columns`
    uses."""
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
    j, y_found = _y_rulebook(dil_ids, dil_cmask, ny, nx)
    out = dict(dil_ids=dil_ids, dil_cmask=dil_cmask,
               embed_slot=embed_slot, y_slots=j, y_found=y_found,
               kept=ok)
    if subm_cap is None:
        return out

    def act_at(q, okq):
        jq = _searchsorted_clamped(col_ids, q, col_ids.shape[0])
        return okq & (col_ids[jq] == q)

    def consumed(w, okw):
        wy = w // nx
        return act_at(w - nx, okw & (wy > 0)) | \
            act_at(w + nx, okw & (wy + 1 < ny))

    ok_m = cmask & (x > 0)
    ok_p = cmask & (x + 1 < nx)
    cand_sub = np.concatenate([
        np.where(ok_m & consumed(col_ids - 1, ok_m), col_ids - 1, INT_MAX),
        np.where(cmask, col_ids, INT_MAX),
        np.where(ok_p & consumed(col_ids + 1, ok_p), col_ids + 1, INT_MAX),
    ]).astype(np.int32)
    sub_ids, sub_cmask = _unique_capped(cand_sub, subm_cap)
    s_embed = _searchsorted_clamped(
        sub_ids, np.where(cmask, col_ids, INT_MAX), subm_cap)
    ok_sub = cmask & (sub_ids[s_embed] == col_ids)
    sj, s_found = _y_rulebook(sub_ids, sub_cmask, ny, nx)
    exp_j = _searchsorted_clamped(
        sub_ids, np.where(dil_cmask, dil_ids, INT_MAX), subm_cap)
    exp_found = dil_cmask & (sub_ids[exp_j] == dil_ids)
    # a column's features survive to the strided conv iff kept in BOTH
    # tables (refined holds them through the subm blocks; the expand
    # embeds them into the full table the strided conv reads)
    out.update(sub_ids=sub_ids, sub_cmask=sub_cmask,
               sub_embed=np.where(ok_sub, s_embed,
                                  subm_cap).astype(np.int32),
               sub_y_slots=sj, sub_y_found=s_found,
               exp_slot=exp_j, exp_found=exp_found,
               kept=ok & ok_sub)
    return out


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


def _project_uv(xyz: np.ndarray, lidar2img: np.ndarray,
                lidar_aug: Optional[np.ndarray],
                img_aug: Optional[np.ndarray],
                eps: float = 1e-5) -> Tuple[np.ndarray, np.ndarray]:
    """numpy mirror of ops/projection.project_points_to_cameras —
    (uv (N, P, 2) network-input pixels, in_front (N, P))."""
    xyz = xyz.astype(np.float32)
    if lidar_aug is not None:
        inv = np.linalg.inv(np.asarray(lidar_aug, np.float32))
        xyz = xyz @ inv[:3, :3].T + inv[:3, 3]
    hom = np.concatenate([xyz, np.ones_like(xyz[:, :1])], -1)
    cam = np.einsum("nij,pj->npi", np.asarray(lidar2img, np.float32), hom)
    depth = cam[..., 2]
    front = depth > eps
    uv = cam[..., :2] / np.maximum(depth[..., None], eps)
    if img_aug is not None:
        ia = np.asarray(img_aug, np.float32)
        uvh = np.concatenate(
            [uv, np.ones(uv.shape[:-1] + (2,), np.float32)], -1)
        uv = np.einsum("nij,npj->npi", ia, uvh)[..., :2]
    return uv, front


def p2g_plan(points: np.ndarray, pillar: Dict[str, np.ndarray],
             max_points: int, max_voxels: int, num_views: int,
             img_hw: Tuple[int, int], lidar2img: np.ndarray,
             img_aug: Optional[np.ndarray] = None,
             lidar_aug: Optional[np.ndarray] = None,
             sec_per_cam: Optional[int] = None,
             cam_cap: Optional[int] = None,
             margin: float = 4.0) -> Optional[Dict[str, np.ndarray]]:
    """Per-camera partition of the pillar point slots for P2G sampling.

    The brute P2G (`isfusion_encoder._img_to_bev`) bilinear-samples ALL
    P = max_voxels*max_points pillar slots in EVERY camera and masks —
    6x the necessary gather traffic, ~70 ms of the flagship step. Each
    slot is visible in ~1 camera (~10% two-camera overlap), so the host
    assigns every slot to its first potentially-valid camera: ``perm``
    is a TOTAL permutation of the P slots into num_views equal blocks of
    cap = P // num_views (primary assignments first, never-valid slots
    as block filler), and the device samples each block only in its own
    camera, undoing the permutation with ONE row gather (no scatter).
    Additional (slot, cam) contributions beyond the primary go to
    per-cam SECONDARY blocks of ``sec_per_cam`` (default cap // 4),
    scatter-added on device. ``cam_cap`` (default P // num_views)
    shrinks the sampled blocks: the permutation stays total over P, but
    only the first num_views * cam_cap positions are sampled — the tail
    holds never-valid slots (empty pillar padding is typically most of
    P) and the device zero-pads instead of sampling it.

    Exactness: the host validity test is a SUPERSET filter (margin
    covers the train-time pixel jitter + bilinear support); the device
    re-applies its exact per-(cam, slot) validity mask, so a too-wide
    host margin only costs capacity, never correctness. Returns None
    when capacities overflow or P is not divisible by num_views — the
    device then falls back to the brute path (safety valve).

    Emits: p2g_src (P,) int32 = cam * P + slot per permuted position;
    p2g_iperm (P,) int32 (position of slot s); p2g_sec_src
    (nv * sec_per_cam,) int32; p2g_sec_slot; p2g_sec_ok (bool)."""
    t, vp = int(max_points), int(max_voxels)
    p_tot = vp * t
    nv = int(num_views)
    if p_tot % nv:
        return None
    cap = p_tot // nv if cam_cap is None else int(cam_cap)
    if nv * cap > p_tot:
        return None
    if sec_per_cam is None:
        sec_per_cam = cap // 4

    kept = pillar["pmask"]
    slot_of_pt = pillar["vidx"] * t + pillar["rank"]  # valid where kept
    xyz = np.zeros((p_tot, 3), np.float32)
    xyz[slot_of_pt[kept]] = points[kept, :3]
    slot_valid = np.zeros((p_tot,), bool)
    slot_valid[slot_of_pt[kept]] = True

    uv, front = _project_uv(xyz, lidar2img, lidar_aug, img_aug)
    h, w = float(img_hw[0]), float(img_hw[1])
    ok = front & (uv[..., 0] > -margin) & (uv[..., 0] < w + margin) & \
        (uv[..., 1] > -margin) & (uv[..., 1] < h + margin) & \
        slot_valid[None, :]                                   # (nv, P)

    any_ok = ok.any(0)
    primary = np.where(any_ok, ok.argmax(0), -1)              # (P,)
    perm = np.empty((p_tot,), np.int32)
    cam_of_pos = np.repeat(np.arange(nv, dtype=np.int32), cap)
    sec_slots = [[] for _ in range(nv)]
    filler = list(np.nonzero(~any_ok)[0][::-1])               # stack
    pos = 0
    for c in range(nv):
        prim = np.nonzero(primary == c)[0]
        if prim.shape[0] > cap:
            # a camera owns more than P/nv slots: a filler placement of
            # the excess could land valid in another block and double
            # count — brute path instead
            return None
        n_fill = cap - prim.shape[0]
        # with cam_cap = P // nv the filler pool covers block padding
        # exactly (every slot is primary-of-one cam or never-valid);
        # with a smaller cam_cap it can run short only if primaries are
        # extremely unbalanced — brute path then
        if n_fill > len(filler):
            return None
        fill = [filler.pop() for _ in range(n_fill)]
        perm[pos:pos + cap] = np.concatenate(
            [prim, np.asarray(fill, np.int64)]).astype(np.int32)
        pos += cap
    # tail: remaining never-valid slots, NOT sampled on device
    tail = np.asarray(filler[::-1], np.int64)
    perm[pos:] = tail.astype(np.int32)

    # secondary contributions: valid cams beyond the primary
    sec = ok.copy()
    sec[primary[any_ok], np.nonzero(any_ok)[0]] = False
    for c in range(nv):
        sec_slots[c].extend(np.nonzero(sec[c])[0].tolist())
        if len(sec_slots[c]) > sec_per_cam:
            return None     # overlap heavier than budget -> brute path
    s_src = np.zeros((nv * sec_per_cam,), np.int32)
    s_slot = np.zeros((nv * sec_per_cam,), np.int32)
    s_ok = np.zeros((nv * sec_per_cam,), bool)
    for c in range(nv):
        k = len(sec_slots[c])
        sl = np.asarray(sec_slots[c], np.int32)
        s_src[c * sec_per_cam:c * sec_per_cam + k] = c * p_tot + sl
        s_slot[c * sec_per_cam:c * sec_per_cam + k] = sl
        s_ok[c * sec_per_cam:c * sec_per_cam + k] = True

    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(p_tot, dtype=np.int32)
    # only the nv*cap sampled positions carry a source; tail positions
    # (never-valid slots) are zero-padded on device
    return dict(p2g_src=(cam_of_pos * p_tot +
                         perm[:nv * cap]).astype(np.int32),
                p2g_iperm=iperm,
                p2g_sec_src=s_src, p2g_sec_slot=s_slot, p2g_sec_ok=s_ok)


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

    sub_ratios = encoder_cfg.get("subm_dilation_ratios")

    def subm_cap_for(stage):
        if sub_ratios is None or stage >= len(sub_ratios) or \
                sub_ratios[stage] is None:
            return None
        return max(int(cap_for(stage) * float(sub_ratios[stage])) // 8 * 8,
                   8)

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
    dp = dilate_plan(ids, cmask, cur_ny, cur_nx, dil_cap_for(0),
                     subm_cap=subm_cap_for(0))
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
                                 dil_cap_for(out_stage),
                                 subm_cap=subm_cap_for(out_stage))
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

    fe_cfg = dict(mc.get("fusion_encoder") or {})
    nv = int(fe_cfg.get("num_views", 6))

    def fn(batch: Dict) -> Dict:
        if "points" not in batch or "points_mask" not in batch:
            return batch
        pts = np.asarray(batch["points"])
        plan = build_encoder_plan_batch(
            pts, np.asarray(batch["points_mask"]), vl, enc, cap,
            pillar_cfg)
        # per-camera P2G partition (needs the batch's calib + image
        # shape); any per-sample capacity overflow drops the p2g keys
        # for the WHOLE batch (stacked plans need uniform keys) and the
        # device falls back to the brute all-cameras path
        if pillar_cfg is not None and "lidar2img" in batch and \
                "img" in batch:
            img_hw = tuple(np.asarray(batch["img"]).shape[2:4])
            l2i = np.asarray(batch["lidar2img"])
            ia = batch.get("img_aug_matrix")
            la = batch.get("lidar_aug_matrix")
            p2gs = []
            for b in range(pts.shape[0]):
                pil = {k[4:]: plan[k][b] for k in plan
                       if k.startswith("pil_")}
                p2gs.append(p2g_plan(
                    pts[b], pil, int(pillar_cfg["max_points"]),
                    int(pillar_cfg["max_voxels"]), nv, img_hw, l2i[b],
                    None if ia is None else np.asarray(ia)[b],
                    None if la is None else np.asarray(la)[b],
                    sec_per_cam=fe_cfg.get("p2g_sec_per_cam"),
                    cam_cap=fe_cfg.get("p2g_cam_cap")))
            if all(p is not None for p in p2gs):
                for k in p2gs[0]:
                    plan[k] = np.stack([p[k] for p in p2gs])
        batch["sparse_plan"] = plan
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
