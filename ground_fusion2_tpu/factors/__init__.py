from . import line_factors, vio_factors  # noqa: F401
