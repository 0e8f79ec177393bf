from .miou import MetricMIoU, MetricMIoUTemporal, fast_hist

__all__ = ["MetricMIoU", "MetricMIoUTemporal", "fast_hist"]
