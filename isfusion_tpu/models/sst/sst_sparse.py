"""Sparse-token SST: window partition with token drop on sparse voxels.

Parity: `mmdet3d/models/sst/sst_input_layer_v2.py` (drop_single_shift:112,
drop_voxel:135, window partition via `ops/sst/sst_ops.py:get_window_coors
:220` + `get_inner_win_inds:199`, flat2window_v2:140 / window2flat_v2:136)
and the standalone `mmdet3d/models/backbones/sst_v2.py` consuming the
bucketed windows. This is the REAL token-drop machinery — the dense path
in `models/sst/sst.py` covers IS-Fusion's always-full 6x6 windows, while
this module serves SST as a standalone LiDAR backbone over sparse voxels.

TPU-static design: the reference's variable-size per-drop-level tensor
dict becomes fixed-capacity buckets. For each shift variant, each voxel
gets a window id (`get_window_coors` math) and an in-window rank
(`ops/scatter.group_ranks` = ingroup_inds); its drop LEVEL follows its
window's token count through ``drop_info`` ranges, and tokens with rank
>= that level's max_tokens are dropped (exactly `drop_single_shift`).
flat2window is a scatter into (win_cap_l, max_tokens_l, C) per level;
window2flat is the inverse gather. Attention weights are shared across
levels (the reference applies one nn.MultiheadAttention to every dict
entry).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import BACKBONES, MIDDLE_ENCODERS
from ...ops.scatter import group_ranks
from ...ops.sparse import unique_sorted_ids
from .sst import sst_window_pos_embed

_INT_MAX = jnp.iinfo(jnp.int32).max


def get_window_coors(coords: jnp.ndarray, sparse_shape: Sequence[int],
                     window_shape: Sequence[int], do_shift: bool
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-voxel window id + in-window coords (`sst_ops.py:220-268`).

    coords (V, 3) zyx int32; sparse_shape (x, y, z) and window_shape
    (wx, wy[, wz]) follow the reference's x/y/z order.
    """
    if len(window_shape) == 2:
        wx, wy = (int(w) for w in window_shape)
        wz = int(sparse_shape[2])
    else:
        wx, wy, wz = (int(w) for w in window_shape)
    sx, sy, sz = (int(s) for s in sparse_shape)
    nwx = int(np.ceil(sx / wx) + 1)
    nwy = int(np.ceil(sy / wy) + 1)
    nwz = int(np.ceil(sz / wz) + 1)
    if do_shift:
        ox, oy, oz = wx // 2, wy // 2, wz // 2
    else:
        ox, oy, oz = wx, wy, wz
    if sz == wz:
        oz = 0
    cx = coords[:, 2] + ox
    cy = coords[:, 1] + oy
    cz = coords[:, 0] + oz
    win = (cx // wx) * (nwy * nwz) + (cy // wy) * nwz + (cz // wz)
    inner = jnp.stack([cz % wz, cy % wy, cx % wx], axis=-1)
    return win.astype(jnp.int32), inner.astype(jnp.int32)


def _norm_drop_info(drop_info) -> List[dict]:
    if isinstance(drop_info, dict):
        items = [drop_info[k] for k in sorted(drop_info)]
    else:
        items = list(drop_info)
    return [dict(max_tokens=int(d["max_tokens"]),
                 drop_range=tuple(d["drop_range"])) for d in items]


def bucketize_shift(feats: jnp.ndarray, coords: jnp.ndarray,
                    valid: jnp.ndarray, sparse_shape, window_shape,
                    drop_info, win_caps: Sequence[int], do_shift: bool
                    ) -> dict:
    """One shift variant's bucket structure for a single sample.

    Returns dict with per-level lists:
      tokens_l (win_cap_l, T_l, C), tok_valid_l (win_cap_l, T_l),
      inner_l (win_cap_l, T_l, 3)
    plus flat bookkeeping (level (V,), slot (V,), rank (V,), keep (V,))
    for window2flat.
    """
    info = _norm_drop_info(drop_info)
    v = feats.shape[0]
    win, inner = get_window_coors(coords, sparse_shape, window_shape,
                                  do_shift)
    win = jnp.where(valid, win, _INT_MAX)
    rank = group_ranks(win, valid)
    # per-window token count -> per-voxel count (drop_voxel:135):
    # count[v] = (max rank within its window) + 1, via a segment max over
    # each window's slot in its own unique-id table
    tbl, _ = unique_sorted_ids(win, v)
    slot_all = jnp.minimum(jnp.searchsorted(tbl, win, method="sort"),
                           v - 1).astype(jnp.int32)
    per_win_count = jnp.zeros((v + 1,), jnp.int32).at[
        jnp.where(valid, slot_all, v)].max(rank + 1, mode="drop")
    count = per_win_count[jnp.minimum(slot_all, v)]

    level = jnp.full((v,), -1, jnp.int32)
    keep = jnp.zeros((v,), bool)
    for li, d in enumerate(info):
        lo, hi = d["drop_range"]
        in_range = valid & (count >= lo) & (count < hi)
        level = jnp.where(in_range, li, level)
        keep = keep | (in_range & (rank < d["max_tokens"]))

    buckets = []
    slots = jnp.zeros((v,), jnp.int32)
    for li, d in enumerate(info):
        cap = int(win_caps[li])
        t = d["max_tokens"]
        lv = keep & (level == li)
        l_tbl, l_mask = unique_sorted_ids(jnp.where(lv, win, _INT_MAX), cap)
        slot = jnp.minimum(jnp.searchsorted(l_tbl, win, method="sort"),
                           cap - 1).astype(jnp.int32)
        ok = lv & (l_tbl[slot] == win)
        slots = jnp.where(ok, slot, slots)
        keep = keep & jnp.where(level == li, ok, True)  # cap overflow drops
        flat = jnp.where(ok, slot * t + jnp.minimum(rank, t - 1), cap * t)
        c = feats.shape[-1]
        tok = jnp.zeros((cap * t + 1, c), feats.dtype).at[flat].set(
            jnp.where(ok[:, None], feats, 0.0), mode="drop",
            unique_indices=True)[:-1].reshape(cap, t, c)
        tval = jnp.zeros((cap * t + 1,), bool).at[flat].set(
            ok, mode="drop", unique_indices=True)[:-1].reshape(cap, t)
        tinner = jnp.zeros((cap * t + 1, 3), jnp.int32).at[flat].set(
            inner, mode="drop", unique_indices=True)[:-1].reshape(cap, t, 3)
        buckets.append(dict(tokens=tok, tok_valid=tval, inner=tinner,
                            max_tokens=t, win_valid=l_mask))
    return dict(buckets=buckets, level=level, slot=slots, rank=rank,
                keep=keep, inner=inner)


def window2flat(part: dict, updated: List[jnp.ndarray],
                feats: jnp.ndarray) -> jnp.ndarray:
    """Gather attended bucket tokens back to the flat voxel order.
    Drop-survivor selection happens at the input layer (reference
    drop_voxel removes dropped voxels entirely); non-kept rows pass
    through untouched here and are excluded from the output canvas."""
    out = feats
    info_n = len(updated)
    for li in range(info_n):
        tok = updated[li]
        cap, t, c = tok.shape
        sel = part["keep"] & (part["level"] == li)
        flat_idx = part["slot"] * t + jnp.minimum(part["rank"], t - 1)
        gathered = tok.reshape(cap * t, c)[
            jnp.clip(flat_idx, 0, cap * t - 1)]
        out = jnp.where(sel[:, None], gathered, out)
    return out


@MIDDLE_ENCODERS.register_module()
class SSTInputLayerV2(nn.Module):
    """Regional grouping producing per-shift token buckets
    (`sst_input_layer_v2.py:18`). Param-less; kept as a module so configs
    compose it like the reference (middle_encoder=SSTInputLayerV2)."""

    drop_info: Any = ({"max_tokens": 36, "drop_range": (0, 100000)},)
    window_shape: Sequence[int] = (6, 6, 1)
    sparse_shape: Sequence[int] = (400, 400, 1)
    shuffle_voxels: bool = False  # host-side concern; kept for config
    win_caps: Optional[Sequence[int]] = None

    def _caps(self, v: int) -> List[int]:
        info = _norm_drop_info(self.drop_info)
        if self.win_caps is not None:
            return [int(c) for c in self.win_caps]
        return [max(1, v // max(1, int(d["drop_range"][0]) or 1))
                for d in info]

    def __call__(self, feats: jnp.ndarray, coords: jnp.ndarray,
                 valid: jnp.ndarray) -> List[dict]:
        """Single-sample (V, C) + (V, 3) zyx -> [no-shift, shift] parts.

        Reference `drop_voxel:135` REMOVES voxels dropped by either
        shift's token budget before building the final indexings, so the
        survivor set (and the shift-1 ranks) are computed on the voxels
        kept by shift 0. Mirrored here with a two-pass bucketize; the
        composite mask is returned as part['keep_all'] for callers to
        exclude dropped voxels downstream (r3 parity fix — previously
        dropped voxels leaked their un-attended features into the BEV
        canvas)."""
        v = feats.shape[0]
        caps = self._caps(v)
        k0 = bucketize_shift(feats, coords, valid, self.sparse_shape,
                             self.window_shape, self.drop_info, caps,
                             False)["keep"]
        k1 = bucketize_shift(feats, coords, valid & k0, self.sparse_shape,
                             self.window_shape, self.drop_info, caps,
                             True)["keep"]
        eff = valid & k0 & k1
        parts = [bucketize_shift(feats, coords, eff, self.sparse_shape,
                                 self.window_shape, self.drop_info, caps,
                                 do_shift) for do_shift in (False, True)]
        for p in parts:
            p["keep_all"] = eff
        return parts


class _BucketAttention(nn.Module):
    """One encoder layer applied over every drop-level bucket with SHARED
    weights (`sst_basic_block_v2.py:14-127`)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    window_shape: Sequence[int]
    dropout: float = 0.0
    pos_temperature: float = 1000.0
    layer_cfg: Any = None

    @nn.compact
    def __call__(self, part: dict, feats: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        det = not train
        from .sst import make_window_attention
        attn_m = make_window_attention(
            self.layer_cfg, num_heads=self.nhead,
            qkv_features=self.d_model, out_features=self.d_model,
            dropout_rate=self.dropout, name="win_attn")
        lin1 = nn.Dense(self.dim_feedforward, name="linear1")
        lin2 = nn.Dense(self.d_model, name="linear2")
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        wx, wy = int(self.window_shape[0]), int(self.window_shape[1])
        # per-token sinusoidal embed from in-window coords: gather rows of
        # the static (wy*wx, C) table by inner (z, y, x) -> y*wx + x
        table = jnp.asarray(sst_window_pos_embed(
            (wx, wy), self.d_model, self.pos_temperature))
        updated = []
        for b in part["buckets"]:
            tok, tval = b["tokens"], b["tok_valid"]
            pos = table[(b["inner"][..., 1] * wx +
                         b["inner"][..., 2]).clip(0, table.shape[0] - 1)]
            q = tok + jnp.where(tval[..., None], pos, 0.0)
            mask = tval[:, None, None, :] & tval[:, None, :, None]
            att = attn_m(q, q, inputs_v=tok, mask=mask, deterministic=det)
            att = jnp.where(tval[..., None], att, 0.0)
            x = norm1(tok + nn.Dropout(self.dropout,
                                       deterministic=det)(att))
            ff = lin2(nn.relu(lin1(x)))
            x = norm2(x + nn.Dropout(self.dropout, deterministic=det)(ff))
            updated.append(jnp.where(tval[..., None], x, 0.0))
        return window2flat(part, updated, feats)


@BACKBONES.register_module()
class SSTv2Sparse(nn.Module):
    """Standalone sparse-voxel SST backbone (`sst_v2.py:12` over the
    sparse input layer). Consumes (B, V, C) voxel features + (B, V, 3)
    zyx coords + mask, returns the dense BEV canvas (B, ny, nx, C)
    (`recover_bev:97`)."""

    d_model: int = 128
    nhead: int = 8
    num_blocks: int = 1
    dim_feedforward: int = 256
    window_shape: Sequence[int] = (6, 6, 1)
    sparse_shape: Sequence[int] = (64, 64, 1)   # (x, y, z)
    drop_info: Any = ({"max_tokens": 36, "drop_range": (0, 100000)},)
    win_caps: Optional[Sequence[int]] = None
    in_channel: Optional[int] = None
    dropout: float = 0.0
    layer_cfg: Any = None   # dict(cosine=True, ...) -> CosineMSA

    @nn.compact
    def __call__(self, feats: jnp.ndarray, coords: jnp.ndarray,
                 valid: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, V, C) voxel rows + (B, V, 3) zyx + (B, V) mask ->
        (B, ny, nx, d_model)."""
        if self.in_channel is not None:
            feats = nn.Dense(self.d_model, name="linear0")(feats)
        info = _norm_drop_info(self.drop_info)
        v = feats.shape[1]
        caps = [int(c) for c in self.win_caps] if self.win_caps is not None \
            else [max(1, v // max(1, int(d["drop_range"][0]) or 1))
                  for d in info]
        # reference drop_voxel semantics: voxels dropped by EITHER
        # shift's token budget are removed from the survivor set before
        # the final groupings (and from the output canvas below)
        k0 = jax.vmap(lambda f, c, m: bucketize_shift(
            f, c, m, self.sparse_shape, self.window_shape, self.drop_info,
            caps, False)["keep"])(feats, coords, valid)
        k1 = jax.vmap(lambda f, c, m: bucketize_shift(
            f, c, m, self.sparse_shape, self.window_shape, self.drop_info,
            caps, True)["keep"])(feats, coords, valid & k0)
        eff = valid & k0 & k1
        parts = [jax.vmap(lambda f, c, m, ds=ds: bucketize_shift(
            f, c, m, self.sparse_shape, self.window_shape, self.drop_info,
            caps, ds))(feats, coords, eff) for ds in (False, True)]

        batched_layer = nn.vmap(
            _BucketAttention, in_axes=(0, 0, None), out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False, "dropout": True})

        x = feats
        for blk in range(self.num_blocks):
            for li, shift in enumerate((0, 1)):
                part = jax.vmap(_rebind)(parts[shift], x)
                x = batched_layer(
                    self.d_model, self.nhead, self.dim_feedforward,
                    self.window_shape, self.dropout,
                    layer_cfg=self.layer_cfg,
                    name=f"block{blk}_layer{li}")(part, x, train)
        # recover_bev: scatter to (ny, nx) canvas (`sst_v2.py:97`)
        sx, sy = int(self.sparse_shape[0]), int(self.sparse_shape[1])

        def to_bev(f, c, m):
            flat_id = jnp.where(m, c[:, 1] * sx + c[:, 2], sx * sy)
            canvas = jnp.zeros((sx * sy + 1, f.shape[-1]), f.dtype)
            canvas = canvas.at[flat_id].set(f, mode="drop")
            return canvas[:-1].reshape(sy, sx, f.shape[-1])
        # dropped voxels are NOT scattered (reference recover_bev only
        # ever sees the drop survivors; leaking un-attended input
        # features fed raw values to the detection head)
        return jax.vmap(to_bev)(x, coords, eff)


def _rebind(part: dict, feats: jnp.ndarray) -> dict:
    """Refresh bucket token features from the (updated) flat features
    without recomputing the partition (scatter by saved bookkeeping)."""
    out = dict(part)
    new_buckets = []
    for li, b in enumerate(part["buckets"]):
        cap, t, c = b["tokens"].shape[0], b["tokens"].shape[1], \
            feats.shape[-1]
        sel = part["keep"] & (part["level"] == li)
        flat = jnp.where(sel, part["slot"] * t +
                         jnp.minimum(part["rank"], t - 1), cap * t)
        tok = jnp.zeros((cap * t + 1, c), feats.dtype).at[flat].set(
            jnp.where(sel[:, None], feats, 0.0), mode="drop",
            unique_indices=True)[:-1].reshape(cap, t, c)
        nb = dict(b)
        nb["tokens"] = tok
        new_buckets.append(nb)
    out["buckets"] = new_buckets
    return out
