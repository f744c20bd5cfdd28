from . import occupancy  # noqa: F401
