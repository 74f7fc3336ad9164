from .compose import Compose  # noqa: F401
from . import loading  # noqa: F401
from . import transforms_3d  # noqa: F401
from . import dbsampler  # noqa: F401
from . import formating  # noqa: F401
from . import test_time_aug  # noqa: F401
from .formating import pad_to  # noqa: F401
