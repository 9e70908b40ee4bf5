from . import feature_tracker  # noqa: F401
