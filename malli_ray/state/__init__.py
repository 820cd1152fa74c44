from . import checkpoint, sketches  # noqa: F401
