from . import scalar, text, vector  # noqa: F401
