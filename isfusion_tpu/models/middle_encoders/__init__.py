from .pillar_scatter import PointPillarsScatter  # noqa: F401
from .sparse_encoder import SparseEncoder  # noqa: F401
from .isfusion_encoder import ISFusionEncoder  # noqa: F401
from .sparse_unet import SparseUNet  # noqa: F401
