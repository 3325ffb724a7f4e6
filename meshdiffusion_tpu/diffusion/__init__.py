from .vpsde import VPSDE  # noqa: F401
