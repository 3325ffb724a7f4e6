from .geometry import DMTetFitter, FitState  # noqa: F401
from .dataset import TargetRenderer  # noqa: F401
