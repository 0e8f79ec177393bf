from .voxel import (
    ce_ssc_loss,
    sem_scal_loss,
    geo_scal_loss,
    lovasz_softmax_loss,
    distance_weighted_focal_loss,
)

__all__ = [
    "ce_ssc_loss",
    "sem_scal_loss",
    "geo_scal_loss",
    "lovasz_softmax_loss",
    "distance_weighted_focal_loss",
]
