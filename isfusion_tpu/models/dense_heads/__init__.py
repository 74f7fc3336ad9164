from .anchor3d_head import Anchor3DHead  # noqa: F401
from .centerpoint_head import CenterHead, SeparateHead  # noqa: F401
from .transfusion_head import TransFusionHeadV2  # noqa: F401
from .fcos_mono3d_head import FCOSMono3DHead  # noqa: F401
from .vote_head import VoteHead  # noqa: F401
from .ssd_3d_head import SSD3DHead  # noqa: F401
from .free_anchor3d_head import FreeAnchor3DHead  # noqa: F401
from .shape_aware_head import ShapeAwareHead  # noqa: F401
from .groupfree3d_head import GroupFree3DHead  # noqa: F401
