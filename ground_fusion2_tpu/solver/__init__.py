from . import gauss_newton, marginalize  # noqa: F401
