from . import colormap, terminal, views  # noqa: F401
