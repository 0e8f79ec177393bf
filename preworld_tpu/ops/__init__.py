from .bev_pool import bev_pool, bev_pool_dense_oracle
from .grid_sample import grid_sample_2d, grid_sample_3d
from .render import (
    raw2alpha,
    alpha2weight,
    cumdist_mask,
    sample_ray_points,
    RaySamplingSpec,
)

__all__ = [
    "bev_pool",
    "bev_pool_dense_oracle",
    "grid_sample_2d",
    "grid_sample_3d",
    "raw2alpha",
    "alpha2weight",
    "cumdist_mask",
    "sample_ray_points",
    "RaySamplingSpec",
]
