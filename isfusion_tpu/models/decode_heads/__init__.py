from .pointnet2_head import PointNet2Head  # noqa: F401
