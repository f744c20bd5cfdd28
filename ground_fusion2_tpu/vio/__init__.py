from . import problem, state  # noqa: F401
