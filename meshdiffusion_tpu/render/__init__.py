from . import utils, ops, mesh, texture, material, light, rasterize  # noqa: F401
from .render import render_mesh, render_layer, shade, render_uv  # noqa: F401
