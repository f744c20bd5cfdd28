from . import klt, tracker  # noqa: F401
