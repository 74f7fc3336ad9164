"""ISFusionDetector — the flagship multimodal detector.

Parity: `mmdet3d/models/detectors/isfusion.py` (ISFusionDetector:13,
extract_feat:178, extract_pts_feat:103, isfusion():84, forward_train:184,
simple_test:285):
camera branch (Swin + GeneralizedLSSFPN, optionally detached) + LiDAR
branch (dynamic voxelize -> DynamicVFE -> SparseEncoder dense BEV) ->
pillarize (pillar = voxel x out_size_factor in xy, full z, <=12 pts,
`isfusion.py:47-51`) -> ISFusionEncoder (HSF + IGF, interleaved with
SECONDV2 stages) -> SECONDFPN -> TransFusionHeadV2.

Batch contract adds to the LiDAR keys: img (B, Nv, H, W, 3) NHWC,
lidar2img (B, Nv, 4, 4), optional img_aug_matrix / lidar_aug_matrix /
img_view_mask (B, Nv) (ModalMask3D's view dropping, applied here like
`isfusion.py:56-60`).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS
from ...ops.voxel import (voxelize_dynamic, voxelize_dynamic_planned,
                          voxelize_hard, voxelize_hard_planned)
from ..builder import build_fusion_layer
from .mvx_two_stage import MVXTwoStageDetector
from .voxelnet import _capacity


@DETECTORS.register_module()
class ISFusionDetector(MVXTwoStageDetector):
    fusion_encoder: Optional[dict] = None
    detach: bool = False
    pc_range: Optional[tuple] = None
    voxel_size: Optional[tuple] = None
    out_size_factor: int = 8
    pillar_max_voxels: tuple = (30000, 60000)

    def setup(self):
        super().setup()
        self.fusion_encoder_m = build_fusion_layer(dict(self.fusion_encoder))

    def extract_img_feat(self, img: jnp.ndarray, view_mask=None,
                         train: bool = False):
        if view_mask is not None:
            img = jnp.where(view_mask[:, :, None, None, None], img, 0.0)
        b, n = img.shape[:2]
        flat = img.reshape((b * n,) + img.shape[2:])
        feats = self.img_backbone_m(flat, train=train)
        if view_mask is not None:
            # Sever the masked views' backward path through the backbone:
            # an all-zero image makes every LayerNorm see zero-variance
            # tokens, whose Jacobian is ~1/sqrt(eps) — any cotangent
            # leaking in (e.g. via the neck's cross-view BatchNorm
            # statistics) is amplified ~316x per norm (1e27 over Swin).
            vm = view_mask.reshape(-1)[:, None, None, None]
            feats = [jnp.where(vm, f, jax.lax.stop_gradient(f))
                     for f in feats]
        if self.detach:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        feats = self.img_neck_m(feats, train=train)
        if not isinstance(feats, (tuple, list)):
            feats = [feats]
        feats = [f.reshape((b, n) + f.shape[1:]) for f in feats]
        if view_mask is not None:
            # Zero the dropped views' FEATURES as well: an all-zero image
            # still yields nonzero constant features, and backprop through
            # those zero-variance activations amplifies gradients by
            # ~1/sqrt(eps) per LayerNorm (1e27 over Swin's depth). Masking
            # here removes the dropped views' gradient path entirely (the
            # reference avoids the blow-up only because its flagship sets
            # detach=True on the image branch).
            feats = [jnp.where(view_mask[:, :, None, None, None], f, 0.0)
                     for f in feats]
        return feats

    def _pillar_size(self):
        vs, pcr = self.voxel_size, self.pc_range
        return (vs[0] * self.out_size_factor, vs[1] * self.out_size_factor,
                pcr[5] - pcr[2])

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        img_feats = self.extract_img_feat(
            batch["img"], batch.get("img_view_mask"), train=train)
        calib = self.calib_from_batch(batch)

        points, points_mask = batch["points"], batch["points_mask"]
        vl = dict(self.pts_voxel_layer)
        cap = _capacity(vl.get("max_voxels", 120000), train)
        if cap <= 0:
            cap = 120000
        # host-precomputed structure plan (ops/host_plan.py): the data
        # pipeline computes all voxel/column/rulebook integer structure
        # on host, overlapped with device compute — the device skips its
        # sort paths (~200 ms/sample of the flagship encoder)
        plan = batch.get("sparse_plan")
        if plan is not None:
            dv = jax.vmap(lambda p, m, pl: voxelize_dynamic_planned(
                p, m, vl["point_cloud_range"], vl["voxel_size"], pl))(
                    points, points_mask,
                    {k: plan[k] for k in ("vidx", "pmask", "vox_coors",
                                          "vmask", "num_voxels")})
        else:
            dv = jax.vmap(lambda p, m: voxelize_dynamic(
                p, m, vl["point_cloud_range"], vl["voxel_size"], cap))(
                    points, points_mask)
        feats = self.pts_voxel_encoder_m(
            points, dv.point_voxel_index, dv.voxel_coors, train=train)
        if plan is not None:
            lidar_bev = self.pts_middle_encoder_m(
                feats, dv.voxel_coors, dv.voxel_mask, train=train,
                plan=plan)
        else:
            lidar_bev = self.pts_middle_encoder_m(
                feats, dv.voxel_coors, dv.voxel_mask, train=train)

        fe = dict(self.fusion_encoder)
        n_pillar_pts = int(fe.get("num_points_in_pillar", 12))
        pillar_cap = _capacity(self.pillar_max_voxels, train)
        if plan is not None and "pil_vidx" in plan:
            pil = jax.vmap(lambda p, pl: voxelize_hard_planned(
                p, pl, n_pillar_pts, pillar_cap))(
                    points,
                    {k[4:]: plan[k] for k in plan if k.startswith("pil_")})
        else:
            pil = jax.vmap(lambda p, m: voxelize_hard(
                p, m, self.pc_range, self._pillar_size(), n_pillar_pts,
                pillar_cap))(points, points_mask)

        p2g = None
        if plan is not None and "p2g_src" in plan:
            p2g = {k: plan[k] for k in plan if k.startswith("p2g_")}
        feats_list, ins_heatmap = self.fusion_encoder_m(
            img_feats, lidar_bev, pil.voxels, pil.coors, pil.voxel_mask,
            pil.num_points, calib, self.pts_backbone_m, train=train,
            p2g=p2g)

        x = self.pts_neck_m(feats_list, train=train)
        preds = self.pts_bbox_head_m(x, img_feats, train=train)
        if mode == "feats":
            return preds, ins_heatmap
        if mode == "loss":
            return self.pts_bbox_head_m.loss(
                preds, batch["gt_bboxes_3d"], batch["gt_labels_3d"],
                batch["gt_mask"], ins_heatmap=ins_heatmap)
        return self.pts_bbox_head_m.get_bboxes(preds)
