from .tet_grid import TetGrid  # noqa: F401
from .marching_tets import marching_tets, MarchingTetsOutput  # noqa: F401
