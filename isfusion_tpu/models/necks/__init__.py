from .second_fpn import SECONDFPN  # noqa: F401
from .fpn import FPN  # noqa: F401
from .generalized_lss import GeneralizedLSSFPN  # noqa: F401
from .yolox_pafpn import YOLOXPAFPN  # noqa: F401
