from . import dda, linalg  # noqa: F401
