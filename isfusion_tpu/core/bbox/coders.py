"""Box coders (device-side, jnp).

Parity targets in `mmdet3d/core/bbox/coders/`:
- DeltaXYZWLHRBBoxCoder (anchor residual coding, SECOND/PointPillars)
- TransFusionBBoxCoder (`transfusion_bbox_coder.py:8`)
- CenterPointBBoxCoder (heatmap top-k decode)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...registry import BBOX_CODERS


@BBOX_CODERS.register_module()
class DeltaXYZWLHRBBoxCoder:
    """Residual coder: xy normalized by anchor BEV diagonal, z by height,
    log-dims, additive yaw, raw velocity deltas for custom values."""

    def __init__(self, code_size: int = 7):
        self.code_size = code_size

    @staticmethod
    def encode(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        xa, ya, za, wa, la, ha, ra = jnp.split(anchors[..., :7], 7, -1)
        xg, yg, zg, wg, lg, hg, rg = jnp.split(gt[..., :7], 7, -1)
        extra_a, extra_g = anchors[..., 7:], gt[..., 7:]
        za = za + ha / 2
        zg = zg + hg / 2
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / ha
        lt = jnp.log(lg / la)
        wt = jnp.log(wg / wa)
        ht = jnp.log(hg / ha)
        rt = rg - ra
        cts = extra_g - extra_a
        return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt, cts], -1)

    @staticmethod
    def decode(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
        xa, ya, za, wa, la, ha, ra = jnp.split(anchors[..., :7], 7, -1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(deltas[..., :7], 7, -1)
        extra_a, extra_t = anchors[..., 7:], deltas[..., 7:]
        za = za + ha / 2
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * ha + za
        lg = jnp.exp(lt) * la
        wg = jnp.exp(wt) * wa
        hg = jnp.exp(ht) * ha
        rg = rt + ra
        zg = zg - hg / 2
        cgs = extra_t + extra_a
        return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg, cgs], -1)


@BBOX_CODERS.register_module()
class TransFusionBBoxCoder:
    """TransFusion query-box coder (`transfusion_bbox_coder.py:8,24,39`).

    encode: xy in BEV-feature-grid units, log dims, gravity-center z,
    sin/cos yaw, raw velocity. decode: inverse + optional score/range filter
    done by callers (kept separate so decode stays shape-static).
    """

    def __init__(self, pc_range: Sequence[float],
                 voxel_size: Sequence[float], out_size_factor: int,
                 post_center_range: Optional[Sequence[float]] = None,
                 score_threshold: float = 0.0, code_size: int = 10):
        self.pc_range = [float(v) for v in pc_range]
        self.voxel_size = [float(v) for v in voxel_size]
        self.out_size_factor = int(out_size_factor)
        self.post_center_range = post_center_range
        self.score_threshold = score_threshold
        self.code_size = code_size

    def encode(self, dst_boxes: jnp.ndarray) -> jnp.ndarray:
        """dst_boxes (..., 9) lidar boxes -> (..., code_size) targets."""
        step_x = self.out_size_factor * self.voxel_size[0]
        step_y = self.out_size_factor * self.voxel_size[1]
        x = (dst_boxes[..., 0] - self.pc_range[0]) / step_x
        y = (dst_boxes[..., 1] - self.pc_range[1]) / step_y
        z = dst_boxes[..., 2] + dst_boxes[..., 5] * 0.5  # gravity center
        dims = jnp.log(dst_boxes[..., 3:6])
        rot = dst_boxes[..., 6]
        out = [x[..., None], y[..., None], z[..., None], dims,
               jnp.sin(rot)[..., None], jnp.cos(rot)[..., None]]
        if self.code_size == 10:
            out.append(dst_boxes[..., 7:9])
        return jnp.concatenate(out, -1)

    def decode(self, heatmap: jnp.ndarray, rot: jnp.ndarray,
               dim: jnp.ndarray, center: jnp.ndarray, height: jnp.ndarray,
               vel: Optional[jnp.ndarray]) -> dict:
        """Decode head outputs into boxes + scores + labels.

        Shapes (per sample): heatmap (num_cls, P), rot (2, P), dim (3, P),
        center (2, P), height (1, P), vel (2, P) or None.
        Returns dict(bboxes (P, 7|9), scores (P,), labels (P,)).
        """
        scores = jnp.max(heatmap, axis=0)
        labels = jnp.argmax(heatmap, axis=0)
        step_x = self.out_size_factor * self.voxel_size[0]
        step_y = self.out_size_factor * self.voxel_size[1]
        xs = center[0] * step_x + self.pc_range[0]
        ys = center[1] * step_y + self.pc_range[1]
        dims = jnp.exp(jnp.clip(dim, -5.0, 5.0))
        yaw = jnp.arctan2(rot[0], rot[1])
        z_bottom = height[0] - dims[2] * 0.5
        cols = [xs, ys, z_bottom, dims[0], dims[1], dims[2], yaw]
        if vel is not None:
            cols += [vel[0], vel[1]]
        bboxes = jnp.stack(cols, axis=-1)
        return dict(bboxes=bboxes, scores=scores, labels=labels)

    def valid_mask(self, bboxes: jnp.ndarray, scores: jnp.ndarray
                   ) -> jnp.ndarray:
        """post_center_range + score filter (decode(filter=True) path)."""
        mask = jnp.ones(scores.shape, jnp.bool_)
        if self.score_threshold > 0:
            mask &= scores > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            center = bboxes[..., :3]
            mask &= jnp.all(center >= pcr[:3], -1) & \
                jnp.all(center <= pcr[3:], -1)
        return mask


@BBOX_CODERS.register_module()
class PartialBinBasedBBoxCoder:
    """VoteNet coder (`partial_bin_based_bbox_coder.py:10`): direction as
    class bin + residual, size as class cluster + residual."""

    def __init__(self, num_dir_bins: int, num_sizes: int,
                 mean_sizes, with_rot: bool = True):
        assert len(mean_sizes) == num_sizes
        self.num_dir_bins = int(num_dir_bins)
        self.num_sizes = int(num_sizes)
        self.mean_sizes = jnp.asarray(mean_sizes, jnp.float32)
        self.with_rot = with_rot

    def angle2class(self, angle: jnp.ndarray):
        angle = angle % (2 * jnp.pi)
        per = 2 * jnp.pi / self.num_dir_bins
        shifted = (angle + per / 2) % (2 * jnp.pi)
        cls = (shifted / per).astype(jnp.int32) % self.num_dir_bins
        res = shifted - (cls.astype(angle.dtype) * per + per / 2)
        return cls, res

    def class2angle(self, cls: jnp.ndarray, res: jnp.ndarray):
        per = 2 * jnp.pi / self.num_dir_bins
        return cls.astype(res.dtype) * per + res

    def encode(self, gt_gravity_center, gt_dims, gt_yaw, gt_labels):
        size_res = gt_dims - self.mean_sizes[gt_labels]
        if self.with_rot:
            dir_cls, dir_res = self.angle2class(gt_yaw)
        else:
            dir_cls = jnp.zeros(gt_yaw.shape, jnp.int32)
            dir_res = jnp.zeros_like(gt_yaw)
        return gt_gravity_center, gt_labels, size_res, dir_cls, dir_res

    def decode(self, center, dir_class_logits, dir_res, size_class_logits,
               size_res):
        """center (..., P, 3); dir_class (..., P, nbins); dir_res same;
        size_class (..., P, nsize); size_res (..., P, nsize, 3)
        -> (..., P, 7) gravity-center boxes."""
        dir_cls = jnp.argmax(dir_class_logits, -1)
        dres = jnp.take_along_axis(dir_res, dir_cls[..., None], -1)[..., 0]
        yaw = self.class2angle(dir_cls, dres) if self.with_rot else \
            jnp.zeros(center.shape[:-1], center.dtype)
        size_cls = jnp.argmax(size_class_logits, -1)
        sres = jnp.take_along_axis(
            size_res, size_cls[..., None, None].repeat(3, -1), -2)[..., 0, :]
        dims = jnp.maximum(self.mean_sizes[size_cls] + sres, 0.01)
        return jnp.concatenate([center, dims, yaw[..., None]], -1)


@BBOX_CODERS.register_module()
class CenterPointBBoxCoder:
    """CenterPoint heatmap decode (`centerpoint_bbox_coders.py`)."""

    def __init__(self, pc_range: Sequence[float], out_size_factor: int,
                 voxel_size: Sequence[float],
                 post_center_range: Optional[Sequence[float]] = None,
                 max_num: int = 100, score_threshold: Optional[float] = None,
                 code_size: int = 9):
        self.pc_range = [float(v) for v in pc_range]
        self.out_size_factor = int(out_size_factor)
        self.voxel_size = [float(v) for v in voxel_size]
        self.post_center_range = post_center_range
        self.max_num = int(max_num)
        self.score_threshold = score_threshold
        self.code_size = code_size

    def decode(self, heat: jnp.ndarray, rot_sine: jnp.ndarray,
               rot_cosine: jnp.ndarray, hei: jnp.ndarray, dim: jnp.ndarray,
               vel: Optional[jnp.ndarray], reg: jnp.ndarray) -> dict:
        """Per-sample decode. heat (H, W, num_cls); other maps (H, W, c).

        Returns dict with top ``max_num`` candidates:
        bboxes (K, code_size), scores (K,), labels (K,).
        """
        h, w, num_cls = heat.shape
        k = self.max_num
        flat = heat.reshape(-1, num_cls)  # (HW, C)
        scores_all = flat.reshape(-1)     # class-major? use (HW*C) carefully
        # top-k over all classes jointly (reference: per-class topk then
        # merge; joint top-k is equivalent for final max_num selection)
        flat_t = flat.T.reshape(-1)       # (C*HW,) class-major
        topv, topi = jax.lax.top_k(flat_t, k)
        labels = topi // (h * w)
        pix = topi % (h * w)
        ys = (pix // w).astype(jnp.float32)
        xs = (pix % w).astype(jnp.float32)

        def gather(m):
            return m.reshape(-1, m.shape[-1])[pix]

        regs = gather(reg)
        xs = xs + regs[:, 0]
        ys = ys + regs[:, 1]
        rot = jnp.arctan2(gather(rot_sine)[:, 0], gather(rot_cosine)[:, 0])
        hei_g = gather(hei)[:, 0]
        dims = gather(dim)
        x = xs * self.out_size_factor * self.voxel_size[0] + self.pc_range[0]
        y = ys * self.out_size_factor * self.voxel_size[1] + self.pc_range[1]
        cols = [x[:, None], y[:, None], hei_g[:, None], dims, rot[:, None]]
        if vel is not None:
            cols.append(gather(vel))
        bboxes = jnp.concatenate(cols, -1)
        mask = jnp.ones((k,), jnp.bool_)
        if self.score_threshold is not None:
            mask &= topv > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            mask &= jnp.all(bboxes[:, :3] >= pcr[:3], -1) & \
                jnp.all(bboxes[:, :3] <= pcr[3:], -1)
        return dict(bboxes=bboxes, scores=jnp.where(mask, topv, 0.0),
                    labels=labels, mask=mask)


@BBOX_CODERS.register_module()
class AnchorFreeBBoxCoder(PartialBinBasedBBoxCoder):
    """SSD3D's anchor-free coder (`anchor_free_bbox_coder.py:9`): size as
    direct half-extent offsets (decoded as 2*size, clamped), direction as
    bin + residual normalized by the bin width."""

    def __init__(self, num_dir_bins: int, with_rot: bool = True):
        super().__init__(num_dir_bins, 0, [], with_rot=with_rot)

    def encode(self, gt_gravity_center, gt_dims, gt_yaw, gt_labels):
        size_res_target = gt_dims / 2
        if self.with_rot:
            dir_cls, dir_res = self.angle2class(gt_yaw)
            dir_res = dir_res / (2 * jnp.pi / self.num_dir_bins)
        else:
            dir_cls = jnp.zeros_like(gt_labels)
            dir_res = jnp.zeros_like(gt_yaw)
        return gt_gravity_center, size_res_target, dir_cls, dir_res

    def decode(self, center, dir_class_logits, dir_res_norm, size):
        """center (..., P, 3), dir_class (..., P, nbins), dir_res_norm
        likewise (normalized residuals), size (..., P, 3)."""
        if self.with_rot:
            dir_cls = jnp.argmax(dir_class_logits, -1)
            res = jnp.take_along_axis(
                dir_res_norm * (2 * jnp.pi / self.num_dir_bins),
                dir_cls[..., None], -1)[..., 0]
            yaw = self.class2angle(dir_cls, res)
        else:
            yaw = jnp.zeros(center.shape[:-1], center.dtype)
        dims = jnp.clip(size * 2, 0.1, None)
        return jnp.concatenate([center, dims, yaw[..., None]], -1)


@BBOX_CODERS.register_module()
class GroupFree3DBBoxCoder(PartialBinBasedBBoxCoder):
    """GroupFree3D coder (`groupfree3d_bbox_coder.py:9`): partial-bin
    direction + either class-agnostic size (direct) or class-cluster
    size residuals."""

    def __init__(self, num_dir_bins: int, num_sizes: int, mean_sizes,
                 with_rot: bool = True, size_cls_agnostic: bool = True):
        super().__init__(num_dir_bins, num_sizes, mean_sizes,
                         with_rot=with_rot)
        self.size_cls_agnostic = bool(size_cls_agnostic)

    def encode(self, gt_gravity_center, gt_dims, gt_yaw, gt_labels):
        base = super().encode(gt_gravity_center, gt_dims, gt_yaw,
                              gt_labels)
        center, size_cls, size_res, dir_cls, dir_res = base
        dir_res = dir_res / (2 * jnp.pi / self.num_dir_bins)
        size_target = gt_dims  # class-agnostic target (`encode:58-76`)
        return (center, size_target, size_cls, size_res, dir_cls, dir_res)

    def decode(self, bbox_out, prefix: str = ""):
        center = bbox_out[f"{prefix}center"]
        if self.with_rot:
            dir_cls = jnp.argmax(bbox_out[f"{prefix}dir_class"], -1)
            res = jnp.take_along_axis(
                bbox_out[f"{prefix}dir_res"], dir_cls[..., None],
                -1)[..., 0]
            yaw = self.class2angle(dir_cls, res)
        else:
            yaw = jnp.zeros(center.shape[:-1], center.dtype)
        if self.size_cls_agnostic:
            dims = bbox_out[f"{prefix}size"]
        else:
            size_cls = jnp.argmax(bbox_out[f"{prefix}size_class"], -1)
            res = jnp.take_along_axis(
                bbox_out[f"{prefix}size_res"],
                size_cls[..., None, None].repeat(3, -1), -2)[..., 0, :]
            dims = self.mean_sizes[size_cls] + res
        return jnp.concatenate([center, dims, yaw[..., None]], -1)


@BBOX_CODERS.register_module()
class NMSFreeCoder:
    """DETR-style top-k decode (`nms_free_coder.py:10`): flat top-k over
    (query, class) sigmoid scores, denormalized boxes, post-center-range
    and score filters — NMS-free."""

    def __init__(self, pc_range, voxel_size=None, post_center_range=None,
                 max_num: int = 100, score_threshold=None,
                 num_classes: int = 10):
        self.pc_range = pc_range
        self.post_center_range = post_center_range
        self.max_num = int(max_num)
        self.score_threshold = score_threshold
        self.num_classes = int(num_classes)

    def decode_single(self, cls_scores: jnp.ndarray,
                      bbox_preds: jnp.ndarray) -> dict:
        """cls_scores (Q, num_classes) logits; bbox_preds (Q, >=8) in the
        normalized (cx, cy, w, l, cz, h, sin, cos[, vx, vy]) format."""
        scores = jax.nn.sigmoid(cls_scores).reshape(-1)
        k = min(self.max_num, scores.shape[0])
        topv, topi = jax.lax.top_k(scores, k)
        labels = topi % self.num_classes
        bidx = topi // self.num_classes
        bp = bbox_preds[bidx]
        cx = bp[:, 0] * (self.pc_range[3] - self.pc_range[0]) + \
            self.pc_range[0]
        cy = bp[:, 1] * (self.pc_range[4] - self.pc_range[1]) + \
            self.pc_range[1]
        cz = bp[:, 4] * (self.pc_range[5] - self.pc_range[2]) + \
            self.pc_range[2]
        w = jnp.exp(bp[:, 2])
        l = jnp.exp(bp[:, 3])
        h = jnp.exp(bp[:, 5])
        yaw = jnp.arctan2(bp[:, 6], bp[:, 7])
        cols = [cx[:, None], cy[:, None], cz[:, None], w[:, None],
                l[:, None], h[:, None], yaw[:, None]]
        if bp.shape[-1] > 8:
            cols.append(bp[:, 8:10])
        boxes = jnp.concatenate(cols, -1)
        mask = jnp.ones((k,), bool)
        if self.score_threshold is not None:
            mask &= topv > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            mask &= jnp.all(boxes[:, :3] >= pcr[:3], -1) & \
                jnp.all(boxes[:, :3] <= pcr[3:], -1)
        return dict(bboxes=boxes, scores=jnp.where(mask, topv, 0.0),
                    labels=labels, mask=mask)


@BBOX_CODERS.register_module()
class MultiTaskBBoxCoder:
    """Per-task delegating coder (`multi_task_bbox_coder.py`): routes
    encode/decode through a DeltaXYZWLHRBBoxCoder per task group."""

    def __init__(self, code_size: int = 7, **kwargs):
        self.inner = DeltaXYZWLHRBBoxCoder(code_size=code_size)
        self.code_size = code_size

    def encode(self, anchors, gt):
        return self.inner.encode(anchors, gt)

    def decode(self, anchors, deltas):
        return self.inner.decode(anchors, deltas)
