from . import dynamic, klt, lines, tracker  # noqa: F401
