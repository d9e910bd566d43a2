from . import clock, config, stepper  # noqa: F401
