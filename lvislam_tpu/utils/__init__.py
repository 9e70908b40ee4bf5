from . import bus, checkpoint, metrics, synthetic  # noqa: F401
