from .structures import (  # noqa: F401
    BaseInstance3DBoxes, LiDARInstance3DBoxes, CameraInstance3DBoxes,
    DepthInstance3DBoxes, Box3DMode, get_box_type, limit_period,
    rotation_3d_in_axis, xywhr2xyxyr)
from . import box_np_ops  # noqa: F401
from .assigners import HungarianAssigner3D, AssignResult  # noqa: F401
from .samplers import IoUNegPiecewiseSampler, PseudoSampler  # noqa: F401,E501
