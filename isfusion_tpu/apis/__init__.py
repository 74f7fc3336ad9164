from .train import train_model, set_random_seed  # noqa: F401
from .test import single_device_test  # noqa: F401
from .inference import init_model, inference_detector  # noqa: F401
