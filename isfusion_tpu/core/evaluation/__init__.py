from .nuscenes_eval import nuscenes_style_eval  # noqa: F401
