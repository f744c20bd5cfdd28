from . import cameras, lie, robust  # noqa: F401
