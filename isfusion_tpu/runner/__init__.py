from .optim import build_optimizer, build_lr_schedule  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
