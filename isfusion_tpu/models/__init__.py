from .builder import (  # noqa: F401
    build_backbone, build_detector, build_fusion_layer, build_head,
    build_middle_encoder, build_neck, build_voxel_encoder, build_model)

# Import submodules for registration side effects.
from . import layers  # noqa: F401
from . import transformer  # noqa: F401
from . import sst  # noqa: F401
from . import losses  # noqa: F401
from . import voxel_encoders  # noqa: F401
from . import middle_encoders  # noqa: F401
from . import backbones  # noqa: F401
from . import necks  # noqa: F401
from . import fusion_layers  # noqa: F401
from . import dense_heads  # noqa: F401
from . import detectors  # noqa: F401
from . import decode_heads  # noqa: F401
from . import roi_heads  # noqa: F401
from . import segmentors  # noqa: F401
