from .sst import (CosineMultiHeadAttention, SRABlock, SSTv2,  # noqa: F401
                  sst_window_pos_embed)
from .sst_sparse import SSTInputLayerV2, SSTv2Sparse  # noqa: F401
