from .anchor3d_head import Anchor3DHead  # noqa: F401
