from . import camera, lie  # noqa: F401
