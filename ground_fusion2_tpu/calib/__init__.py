from . import intrinsics  # noqa: F401
