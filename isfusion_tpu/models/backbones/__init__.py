from .second import SECOND, SECONDV2  # noqa: F401
from .swin import SwinTransformer  # noqa: F401
