from . import lio, loop, vio  # noqa: F401
