from . import image_io, timing  # noqa: F401
