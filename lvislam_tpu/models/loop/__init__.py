from . import loop_detector  # noqa: F401
