from .point_fusion import PointFusion  # noqa: F401
