from .scatter import (  # noqa: F401
    segment_sum, segment_max, segment_mean, group_ranks, unique_with_ranks)
from .voxel import (  # noqa: F401
    VoxelizationOutput, compute_voxel_coords, voxelize_hard, voxelize_dynamic,
    dynamic_scatter)
from .box_ops import (  # noqa: F401
    limit_period, boxes_iou_bev, boxes_overlap_3d, boxes_iou_3d,
    rotated_corners_2d, circle_nms_mask, nms_bev_mask)
from .gaussian import gaussian_radius, draw_heatmap_gaussian  # noqa: F401
from .interpolate import (  # noqa: F401
    bilinear_sample, grid_sample, resize_bilinear)
from .sparse import (  # noqa: F401
    SparseGrid, build_sparse_grid, subm_conv3d, sparse_conv3d,
    sparse_to_dense)
