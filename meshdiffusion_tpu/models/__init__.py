from .registry import register_model, get_model, create_model  # noqa: F401
from . import unet3d  # noqa: F401  (registers ddpm_res64 / ddpm_res128)
