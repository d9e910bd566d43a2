from . import euler2d, limiters, riemann, sdf, shift  # noqa: F401
