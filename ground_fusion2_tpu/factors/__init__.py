from . import vio_factors  # noqa: F401
