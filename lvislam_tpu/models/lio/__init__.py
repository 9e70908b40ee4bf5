from . import frontend, mapping  # noqa: F401
