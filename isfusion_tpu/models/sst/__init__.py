from .sst import SSTv2, sst_window_pos_embed  # noqa: F401
