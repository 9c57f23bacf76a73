from . import pipeline, wavefront  # noqa: F401
