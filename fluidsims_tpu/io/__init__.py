from . import fourspl  # noqa: F401
