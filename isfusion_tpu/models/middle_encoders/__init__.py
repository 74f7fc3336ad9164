from .pillar_scatter import PointPillarsScatter  # noqa: F401
