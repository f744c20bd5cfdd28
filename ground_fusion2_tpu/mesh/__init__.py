from . import export  # noqa: F401
