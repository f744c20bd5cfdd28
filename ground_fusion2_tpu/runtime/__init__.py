from . import native_bindings  # noqa: F401
