from .second import SECOND, SECONDV2  # noqa: F401
