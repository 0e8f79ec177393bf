from .miou import (
    MetricMIoU,
    MetricMIoUTemporal,
    fast_hist,
    OCC3D_CLASS_NAMES,
    NUPLAN_CLASS_NAMES,
)
from .fscore import MetricFScore

__all__ = [
    "MetricMIoU",
    "MetricMIoUTemporal",
    "MetricFScore",
    "fast_hist",
    "OCC3D_CLASS_NAMES",
    "NUPLAN_CLASS_NAMES",
]
