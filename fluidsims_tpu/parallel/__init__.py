from . import halo, mesh  # noqa: F401
