from .voxelnet import VoxelNet, DynamicVoxelNet  # noqa: F401
from .mvx_two_stage import MVXFasterRCNN, DynamicMVXFasterRCNN  # noqa: F401
from .centerpoint import CenterPoint, DynamicCenterPoint  # noqa: F401
from .isfusion import ISFusionDetector  # noqa: F401
from .single_stage_mono3d import FCOSMono3D  # noqa: F401
from .transfusion import TransFusionDetector  # noqa: F401
from .votenet import VoteNet  # noqa: F401
from .parta2 import PartA2  # noqa: F401
from .imvoxelnet import ImVoxelNet, OutdoorImVoxelNeck  # noqa: F401
from .indoor_variants import (  # noqa: F401
    SSD3DNet, GroupFree3DNet, ImVoteNet)
from .h3dnet import H3DNet  # noqa: F401
