from .dataset import ShapeNetDMTetDataset, GridLoader  # noqa: F401
