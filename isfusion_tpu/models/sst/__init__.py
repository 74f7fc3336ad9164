from .sst import SSTv2, sst_window_pos_embed  # noqa: F401
from .sst_sparse import SSTInputLayerV2, SSTv2Sparse  # noqa: F401
