from .frustum import (
    create_frustum,
    frustum_to_lidar,
    GridConfig,
    voxel_indices,
    frustum_pixel_indices,
)
from .transforms import (
    sensor2keyego_chain,
    curr2adjsensor_chain,
    bda_matrix,
    invert_rigid,
)
from .rays import get_rays, build_rays, weighted_ray_sample, RAY_DIM

__all__ = [
    "create_frustum",
    "frustum_to_lidar",
    "GridConfig",
    "voxel_indices",
    "frustum_pixel_indices",
    "sensor2keyego_chain",
    "curr2adjsensor_chain",
    "bda_matrix",
    "invert_rigid",
    "get_rays",
    "build_rays",
    "weighted_ray_sample",
    "RAY_DIM",
]
