from .bbox.structures import (  # noqa: F401
    BaseInstance3DBoxes, LiDARInstance3DBoxes, CameraInstance3DBoxes,
    DepthInstance3DBoxes, Box3DMode, get_box_type, limit_period,
    rotation_3d_in_axis, xywhr2xyxyr)
from .points import (  # noqa: F401
    BasePoints, LiDARPoints, CameraPoints, DepthPoints, get_points_type)
from .anchor import (  # noqa: F401
    Anchor3DRangeGenerator, AlignedAnchor3DRangeGenerator)
from .bbox import coders  # noqa: F401  (registration side effects)
