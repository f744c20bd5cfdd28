from . import export, incremental  # noqa: F401
