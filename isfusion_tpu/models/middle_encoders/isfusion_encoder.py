"""ISFusionEncoder — hierarchical scene fusion + instance-guided fusion.

Parity: `mmdet3d/models/middle_encoders/fusion_encoder.py:833`
(ISFusionEncoder, forward:1152):
- Point-to-Grid: pillar points projected into the cameras, image features
  bilinearly sampled, summed over views and over the <=12 points per
  pillar, scattered to the BEV grid (`img_fv_to_bev:1046` +
  `img_point_sampling:965`). The reference loops python over B x 6 cams;
  here one batched projection + vmapped grid_sample.
- conv_fusion 768 -> 128 (`:1165`).
- Per-level Grid-to-Region: dense shifted-window SST attention
  (`SSTInputLayerV2` + `SSTv2`) interleaved with SECONDV2 stages
  (`:1180-1192`).
- Instance-guided fusion after level 0 (`instance_fusion:1090`):
  class heatmap -> max-pool NMS -> top-`instance_num` queries ->
  InsContextAtt (2 deformable decoder layers, n_points 16,
  `InsContextAtt:768` / `MSDeformAttn:505`) -> Instane2SceneAtt
  (scene tokens attend to instances + per-channel spatial attention,
  `Instane2SceneAtt:472`) -> instance-aware BEV + aux heatmap.

All NHWC, static shapes.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import FUSION_LAYERS
from ...ops.deform_attn import ms_deform_attn_sample
from ...ops.interpolate import grid_sample
from ...ops.projection import project_points_to_cameras
from ..layers import ConvModule, resolve_dtype
from ..sst.sst import SSTv2
from ..transformer import PositionEmbeddingLearned, mha


def _radial_offset_init(n_heads: int, n_levels: int, n_points: int):
    """Reference's sampling_offsets bias init (`fusion_encoder.py:545-552`):
    head-wise unit directions scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(flat, dtype).reshape(shape)

    return init


class MSDeformAttn(nn.Module):
    """Single/multi-level deformable attention (`fusion_encoder.py:505`)."""

    d_model: int = 256
    n_levels: int = 1
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, query: jnp.ndarray, reference_points: jnp.ndarray,
                 src: jnp.ndarray, spatial_shapes: Sequence[Tuple[int, int]]
                 ) -> jnp.ndarray:
        """query (B, Lq, C); reference_points (B, Lq, n_levels, 2) in [0,1];
        src (B, sum HW, C); spatial_shapes static [(h, w), ...]."""
        b, lq, c = query.shape
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        hd = c // nh
        value = nn.Dense(c, dtype=self.dtype, name="value_proj")(src)
        # offsets/weights in f32: sampling locations are geometry
        offsets = nn.Dense(
            nh * nl * npts * 2, kernel_init=nn.initializers.zeros,
            bias_init=_radial_offset_init(nh, nl, npts),
            name="sampling_offsets")(query.astype(jnp.float32)
                                     ).reshape(b, lq, nh, nl, npts, 2)
        attn = nn.Dense(nh * nl * npts, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(
                            query.astype(jnp.float32))
        attn = jax.nn.softmax(attn.reshape(b, lq, nh, nl * npts), -1)
        attn = attn.reshape(b, lq, nh, nl, npts)
        normalizer = jnp.asarray(
            [[wh[1], wh[0]] for wh in spatial_shapes], jnp.float32)
        loc = reference_points[:, :, None, :, None, :] + \
            offsets / normalizer[None, None, None, :, None, :]

        starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])

        def per_sample(val, loc_s, attn_s):
            maps = [val[starts[i]:starts[i + 1]].reshape(h, w, nh, hd)
                    for i, (h, w) in enumerate(spatial_shapes)]
            return ms_deform_attn_sample(maps, loc_s, attn_s)

        out = jax.vmap(per_sample)(value.reshape(b, -1, nh, hd), loc,
                                   attn.astype(value.dtype))
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


class _DeformableDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN, post-norm
    (`DeformableTransformerDecoderLayer:602`)."""

    d_model: int
    d_ffn: int
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 1
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, tgt, query_pos_embed, reference_points, src,
                 spatial_shapes, train: bool = False):
        det = not train
        dt = self.dtype
        q = tgt + query_pos_embed
        attn = mha(self.d_model, self.n_heads, self.dropout, dtype=dt,
                   name="self_attn")(q, q, inputs_v=tgt, deterministic=det)
        tgt = nn.LayerNorm(dtype=dt, name="norm2")(
            tgt + nn.Dropout(self.dropout, deterministic=det)(attn))
        cross = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                             self.n_points, dtype=dt, name="cross_attn")(
            tgt + query_pos_embed, reference_points, src, spatial_shapes)
        tgt = nn.LayerNorm(dtype=dt, name="norm1")(
            tgt + nn.Dropout(self.dropout, deterministic=det)(cross))
        ff = nn.Dense(self.d_ffn, dtype=dt, name="linear1")(tgt)
        ff = nn.Dropout(self.dropout, deterministic=det)(nn.relu(ff))
        ff = nn.Dense(self.d_model, dtype=dt, name="linear2")(ff)
        tgt = nn.LayerNorm(dtype=dt, name="norm3")(
            tgt + nn.Dropout(self.dropout, deterministic=det)(ff))
        return tgt


class InsContextAtt(nn.Module):
    """Instance context via deformable attention over the scene BEV
    (`InsContextAtt:768`)."""

    num_layers: int = 2
    embed_dims: int = 128
    bev_size: int = 180
    n_points: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x_ins: jnp.ndarray, query_pos: jnp.ndarray,
                 scene: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x_ins (B, N, C) instance feats; query_pos (B, N, 2) grid coords;
        scene (B, H, W, C). Returns (B, N, C)."""
        b, h, w, c = scene.shape
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        # (row, col) order matching the reference's effective key-pos
        # input for a row-major src flatten (square BEV; see query_pos
        # comment in ISFusionEncoder.instance_fusion)
        bev_pos = jnp.asarray(
            np.stack([gy + 0.5, gx + 0.5], -1).reshape(1, h * w, 2)
            / float(self.bev_size), jnp.float32)
        key_pos = PositionEmbeddingLearned(
            self.embed_dims, dtype=self.dtype, name="key_pos_embed")(
            jnp.broadcast_to(bev_pos, (b, h * w, 2)), train=train)
        ref = query_pos / float(self.bev_size)
        qpe = PositionEmbeddingLearned(
            self.embed_dims, dtype=self.dtype,
            name="query_pos_embed")(ref, train=train)
        src = scene.reshape(b, h * w, c) + key_pos
        out = x_ins
        for i in range(self.num_layers):
            out = _DeformableDecoderLayer(
                self.embed_dims, self.embed_dims, n_points=self.n_points,
                dtype=self.dtype,
                name=f"layer_{i}")(out, qpe, ref[:, :, None], src,
                                   [(h, w)], train=train)
        return out


class Instane2SceneAtt(nn.Module):
    """Scene tokens attend to instances, then per-channel spatial
    attention mixes the instance-aware map back (`Instane2SceneAtt:472`).
    (Name kept as the reference spells it.)"""

    d_model: int
    nhead: int = 8
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, scene_tokens: jnp.ndarray, x_ins: jnp.ndarray,
                 query_scene: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        """scene_tokens (B, HW, C) [conv_ins(bev)]; x_ins (B, N, C);
        query_scene (B, H, W, C) [SST scene feats]. Returns (B, H, W, C)."""
        det = not train
        b, hw, c = scene_tokens.shape
        h, w = query_scene.shape[1:3]
        attn = mha(self.d_model, self.nhead, self.dropout,
                   dtype=self.dtype, name="multihead_attn")(
            scene_tokens, x_ins, inputs_v=x_ins, deterministic=det)
        q = nn.LayerNorm(dtype=self.dtype, name="norm")(
            scene_tokens + nn.Dropout(self.dropout,
                                      deterministic=det)(attn))
        q_ins = q.reshape(b, h, w, c)
        # per-channel spatial attention over rows (reference matmul):
        # aw[b,c,i,j] = sum_w scene[b,i,w,c] * ins[b,j,w,c]
        aw = jnp.einsum("biwc,bjwc->bcij", query_scene, q_ins,
                        preferred_element_type=jnp.float32)
        aw = jax.nn.softmax(aw, axis=-1)
        att = jnp.einsum("bcij,bjwc->biwc", aw, q_ins,
                         preferred_element_type=jnp.float32)
        return query_scene + att.astype(query_scene.dtype)


@FUSION_LAYERS.register_module()
class ISFusionEncoder(nn.Module):
    num_points_in_pillar: int = 12
    embed_dims: int = 256
    num_classes: int = 10
    bev_size: int = 180
    num_views: int = 6
    region_shape: Any = ((6, 6, 1), (6, 6, 1))
    grid_size: Any = ((180, 180, 1), (90, 90, 1))
    region_drop_info: Any = None
    # region_drop_info is VALIDATED, not silently ignored: the dense
    # window path is exact iff every level's max_tokens covers the full
    # region (the flagship's 36 = 6*6*1 does; see SURVEY.md §5
    # long-context note). A config asking for real token-drop (max_tokens
    # below the region size) would change semantics and is rejected.
    instance_num: int = 200
    nms_kernel_size: int = 3
    img_level: int = 1      # which img FPN level feeds P2G (`forward:1160`)
    random_noise: Optional[float] = 1.0
    compute_dtype: Optional[str] = None
    # host-plan capacities for the per-camera P2G partition
    # (ops/host_plan.p2g_plan; consumed by make_plan_fn, not the module):
    # sampled block size per camera and secondary (overlap) budget.
    # None = the plan's defaults (P/num_views and cap/4).
    p2g_cam_cap: Optional[int] = None
    p2g_sec_per_cam: Optional[int] = None
    # profiling knob (tools/analysis_tools/fusion_profile.py): return the
    # intermediate named here ('p2g' | 'fusion' | 'sst0' | 'igf' |
    # 'stage1' | 'sst1'); XLA dead-code-eliminates everything after it,
    # so timing prefixes and differencing gives per-block costs without
    # restructuring the module. None = normal forward.
    return_after: Optional[str] = None

    # ------------------------------------------------------ point-to-grid
    def _img_to_bev(self, img_feat, pillars, pillar_coors, pillar_mask,
                    num_points, calib, train: bool,
                    p2g=None) -> jnp.ndarray:
        """img_feat (B, Nv, h, w, C) one FPN level -> (B, bev, bev, C).

        Memory note: a naive all-cameras-at-once gather materializes
        (Nv * Vp * T, C) x 4 bilinear taps (~16 GB at flagship scale).
        Cameras are therefore processed with a sequential ``lax.scan`` and
        points in pillar chunks via ``lax.map``, keeping the live set to
        one (chunk*T, C) tap at a time while the MXU-facing math is
        unchanged.

        ``p2g`` (host plan, `ops/host_plan.p2g_plan`) switches to the
        per-camera partition: every pillar slot is sampled in ONE camera
        block (a total permutation undone by one row gather), the ~10%
        two-camera-overlap contributions ride a small scatter-add — ~6x
        less bilinear gather traffic than the brute masked all-cameras
        form. The device re-applies its exact validity mask, so the
        host's superset filter never changes the math.
        """
        b, nv = img_feat.shape[:2]
        vp, t = pillars.shape[1:3]
        img_hw = tuple(calib["img_input_shape"])
        c = img_feat.shape[-1]
        bevsz = self.bev_size
        # chunk so one tap buffer stays ~100 MB at C=256
        chunk = max(min(vp, 8192) // 8 * 8, 8)
        nchunk = -(-vp // chunk)
        vp_pad = nchunk * chunk

        noise = jnp.zeros((b,), jnp.float32)
        if self.random_noise and train:
            rng = self.make_rng("dropout")
            k1, k2 = jax.random.split(rng)
            apply = jax.random.bernoulli(k1, 0.5, (b,))
            noise = jnp.where(
                apply,
                jax.random.uniform(k2, (b,), minval=-self.random_noise,
                                   maxval=self.random_noise),
                0.0)

        def single(feat_v, pts, coors, pmask, npts, l2i, img_aug,
                   lidar_aug, nz, plan=None):
            xyz = pts[..., :3].reshape(vp * t, 3)
            # project to ALL cameras at once (cheap: coords only)
            uv, depth, front = project_points_to_cameras(
                xyz, l2i, lidar_aug, img_aug)
            uv = uv + nz  # train-time pixel jitter (`:992-996`)
            gx = uv[..., 0] / img_hw[1] * 2 - 1
            gy = uv[..., 1] / img_hw[0] * 2 - 1
            valid = front & (gx > -1) & (gx < 1) & (gy > -1) & (gy < 1)
            grid = jnp.stack([gx, gy], -1)               # (Nv, VpT, 2)

            if plan is not None:
                p_tot = vp * t
                cap = plan["p2g_src"].shape[0] // nv
                # one row gather fetches coords + validity per sampled
                # position; tail positions (never-valid slots) are
                # zero-padded, not sampled
                gv = jnp.concatenate(
                    [grid, valid[..., None].astype(grid.dtype)],
                    -1).reshape(nv * p_tot, 3)
                g_pos = gv[plan["p2g_src"]]
                sampled = jnp.concatenate([
                    grid_sample(feat_v[ci],
                                g_pos[ci * cap:(ci + 1) * cap, :2])
                    for ci in range(nv)], 0).astype(feat_v.dtype)
                sampled = jnp.where(g_pos[:, 2:3] > 0.5, sampled, 0.0)
                sampled = jnp.pad(
                    sampled, ((0, p_tot - nv * cap), (0, 0)))
                acc = sampled[plan["p2g_iperm"]]
                scap = plan["p2g_sec_src"].shape[0] // nv
                g2 = gv[plan["p2g_sec_src"]]
                s2 = jnp.concatenate([
                    grid_sample(feat_v[ci],
                                g2[ci * scap:(ci + 1) * scap, :2])
                    for ci in range(nv)], 0).astype(feat_v.dtype)
                ok2 = (g2[:, 2] > 0.5) & plan["p2g_sec_ok"]
                s2 = jnp.where(ok2[:, None], s2, 0.0)
                acc = acc.at[plan["p2g_sec_slot"]].add(s2, mode="drop")
                samp = acc.reshape(vp, t, c)
            else:
                pad = vp_pad * t - vp * t
                gridp = jnp.pad(grid, ((0, 0), (0, pad), (0, 0)))
                validp = jnp.pad(valid, ((0, 0), (0, pad)))
                gridp = gridp.reshape(nv, nchunk, chunk * t, 2)
                validp = validp.reshape(nv, nchunk, chunk * t)

                def cam_step(acc, cam):
                    feat, g, v = cam

                    def chunk_fn(args):
                        g_c, v_c = args
                        # f32 grid coords x bf16 feats promote to f32;
                        # the accumulator keeps the feature dtype
                        s = grid_sample(feat, g_c).astype(acc.dtype)
                        return jnp.where(v_c[..., None], s, 0.0)

                    samp_ = jax.lax.map(chunk_fn, (g, v))
                    return acc + samp_.reshape(vp_pad * t, c), None

                acc0 = jnp.zeros((vp_pad * t, c), feat_v.dtype)
                acc, _ = jax.lax.scan(cam_step, acc0,
                                      (feat_v, gridp, validp))
                samp = acc[:vp * t].reshape(vp, t, c)
            tmask = (jnp.arange(t)[None, :] < npts[:, None]) & \
                pmask[:, None]
            pillar_feat = jnp.where(tmask[..., None], samp, 0.0).sum(1)
            # scatter to BEV (zyx coors: [:, 1]=y, [:, 2]=x)
            idx = jnp.where(pmask, coors[:, 1] * bevsz + coors[:, 2],
                            bevsz * bevsz)
            canvas = jnp.zeros((bevsz * bevsz, c), pillar_feat.dtype)
            canvas = canvas.at[idx].set(pillar_feat, mode="drop")
            return canvas.reshape(bevsz, bevsz, c)

        ident4 = jnp.broadcast_to(jnp.eye(4), (b, nv, 4, 4))
        args = (img_feat, pillars, pillar_coors, pillar_mask, num_points,
                calib["lidar2img"], calib.get("img_aug_matrix", ident4),
                calib.get("lidar_aug_matrix",
                          jnp.broadcast_to(jnp.eye(4), (b, 4, 4))), noise)
        if p2g is not None:
            return jax.vmap(lambda *a: single(*a[:-1], plan=a[-1]))(
                *args, p2g)
        return jax.vmap(single)(*args)

    @nn.compact
    def __call__(self, img_feats, lidar_feats, pillars, pillar_coors,
                 pillar_mask, pillar_num_points, calib, pts_backbone,
                 train: bool = False, p2g=None):
        emb = self.embed_dims
        half = emb // 2
        norm2d = dict(type="BN2d")
        dt = resolve_dtype(self.compute_dtype)

        if self.region_drop_info is not None:
            for lvl, (info, shape) in enumerate(
                    zip(self.region_drop_info, self.region_shape)):
                full = int(np.prod(shape))
                toks = [int(d["max_tokens"]) for d in dict(info).values()]
                if min(toks) < full:
                    raise ValueError(
                        f"region_drop_info level {lvl} asks for token drop"
                        f" (max_tokens {min(toks)} < region {full}); the "
                        "dense window path is exact only for full regions "
                        "(the flagship's 36 = 6x6x1). Use the sparse SST "
                        "input layer for real drops.")

        img_lvl = img_feats[self.img_level]
        if dt is not None:
            img_lvl = img_lvl.astype(dt)
            lidar_feats = lidar_feats.astype(dt)
        img_bev = self._img_to_bev(
            img_lvl, pillars, pillar_coors, pillar_mask,
            pillar_num_points, calib, train, p2g=p2g)
        if self.return_after == "p2g":
            return img_bev

        bev = ConvModule(half, kernel_size=3, padding=1, norm_cfg=norm2d,
                         dtype=dt, name="conv_fusion")(
            jnp.concatenate([img_bev, lidar_feats], -1), train=train)
        if self.return_after == "fusion":
            return bev

        b, h, w, _ = bev.shape
        x = bev
        return_feats = []
        ins_heatmap = None
        num_levels = len(self.region_shape)
        for lvl in range(num_levels):
            d = half * (lvl + 1)
            x = SSTv2(d_model=[d] * 4, nhead=[8] * 4, num_blocks=1,
                      dim_feedforward=[d] * 4,
                      window_shape=tuple(self.region_shape[lvl]),
                      in_channel=half if lvl == 0 else None,
                      compute_dtype=self.compute_dtype,
                      name=f"grid2region_{lvl}")(x, train=train)
            if self.return_after == f"sst{lvl}":
                return x
            if lvl == 0:
                # ---- IGF (`instance_fusion:1090`) ----
                hm = ConvModule(half, kernel_size=3, padding=1,
                                norm_cfg=norm2d, dtype=dt,
                                name="conv_heatmap")(
                    jax.lax.stop_gradient(bev), train=train)
                hm = ConvModule(emb // 4, kernel_size=3, padding=1,
                                norm_cfg=norm2d, dtype=dt,
                                name="heatmap_head_1")(
                    hm, train=train)
                hm = ConvModule(emb // 4, kernel_size=3, padding=1,
                                norm_cfg=norm2d, dtype=dt,
                                name="heatmap_head_2")(
                    hm, train=train)
                # heatmap logits in f32: they feed the aux focal loss and
                # the top-k instance selection (score ordering)
                ins_heatmap = nn.Conv(
                    self.num_classes, (3, 3), padding=1,
                    bias_init=nn.initializers.constant(-2.19),
                    name="heatmap_head_3")(hm.astype(jnp.float32))

                heat = jax.nn.sigmoid(jax.lax.stop_gradient(ins_heatmap))
                k = self.nms_kernel_size
                pad = k // 2
                pooled = nn.max_pool(heat, (k, k), strides=(1, 1),
                                     padding="VALID")
                pooled = jnp.pad(
                    pooled, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    constant_values=-jnp.inf)
                keep = heat == pooled
                if self.num_views == 6 and self.num_classes >= 10:
                    flat_cls = jnp.zeros((self.num_classes,), bool
                                         ).at[jnp.asarray([8, 9])].set(True)
                    keep = keep | flat_cls[None, None, None, :]
                heat = heat * keep
                flat_all = heat.reshape(b, h * w, -1).transpose(0, 2, 1)
                flat_all = flat_all.reshape(b, -1)
                _, top = jax.lax.top_k(flat_all, self.instance_num)
                top_index = (top % (h * w)).astype(jnp.int32)
                ys = (top_index // w).astype(jnp.float32) + 0.5
                xs = (top_index % w).astype(jnp.float32) + 0.5
                # (row, col) order — the reference's query_pos_new swap
                # (`fusion_encoder.py:1136-1139`). Its deformable sampler
                # then reads coord 0 as the x axis of the value map, i.e.
                # the reference samples context at the MIRRORED location;
                # published weights were trained under that convention, so
                # conversion parity requires reproducing it (oracle:
                # tests/test_runtime/test_fusion_parity.py).
                query_pos = jnp.stack([ys, xs], -1)   # (B, N, 2)

                x_scene = ConvModule(half, kernel_size=3, padding=1,
                                     norm_cfg=norm2d, dtype=dt,
                                     name="conv_scene")(
                    bev, train=train)
                x_ins = jnp.take_along_axis(
                    x_scene.reshape(b, h * w, half),
                    top_index[..., None], axis=1)
                x_ins = InsContextAtt(
                    num_layers=2, embed_dims=half, bev_size=self.bev_size,
                    n_points=16, dtype=dt, name="instance_att")(
                    x_ins, query_pos, x_scene, train=train)
                scene_tokens = ConvModule(
                    half, kernel_size=3, padding=1, norm_cfg=norm2d,
                    dtype=dt, name="conv_ins")(bev, train=train).reshape(
                        b, h * w, half)
                x = Instane2SceneAtt(d_model=half, dtype=dt,
                                     name="instance_to_scene_att")(
                    scene_tokens, x_ins, x, train=train)
                if self.return_after == "igf":
                    return x
            feat, x = pts_backbone(x, stage=f"stage{lvl + 1}",
                                   train=train) \
                if lvl < num_levels - 1 else \
                (pts_backbone(x, stage=f"stage{lvl + 1}", train=train),
                 None)
            return_feats.append(feat)
            if self.return_after == f"stage{lvl + 1}":
                return feat
        return return_feats, ins_heatmap
