from .second import SECOND, SECONDV2  # noqa: F401
from .swin import SwinTransformer  # noqa: F401
from .resnet import ResNet  # noqa: F401
from .pointnet2 import PointNet2SASSG, PointSAModule, PointFPModule  # noqa: F401
from .regnet import RegNet, NoStemRegNet  # noqa: F401
from .multi_backbone import MultiBackbone  # noqa: F401
