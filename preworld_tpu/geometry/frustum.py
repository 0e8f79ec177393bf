"""Frustum creation and camera->ego->voxel coordinate math.

TPU-native re-design of the reference's LSS view-transform geometry
(`mmdet3d/models/necks/view_transformer.py:84-153,203-261`). Everything here is
pure jnp with static shapes: out-of-range frustum points are mapped to a
sentinel voxel index instead of being filtered, so downstream segment-sums stay
fully static for XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Voxel grid + depth-bin configuration.

    Mirrors the reference's `grid_config` dict
    (`configs/preworld/nuscenes/bevstereo-occ.py:28-33`):
      x/y/z: (lower, upper, interval) in metres.
      depth: (lower, upper, interval) in metres -> D depth bins.
    """

    x: Tuple[float, float, float] = (-40.0, 40.0, 0.4)
    y: Tuple[float, float, float] = (-40.0, 40.0, 0.4)
    z: Tuple[float, float, float] = (-1.0, 5.4, 0.4)
    depth: Tuple[float, float, float] = (1.0, 45.0, 0.5)

    @property
    def lower(self) -> np.ndarray:
        return np.array([self.x[0], self.y[0], self.z[0]], np.float32)

    @property
    def interval(self) -> np.ndarray:
        return np.array([self.x[2], self.y[2], self.z[2]], np.float32)

    @property
    def size(self) -> np.ndarray:
        """Number of voxels along (x, y, z)."""
        return np.array(
            [
                round((self.x[1] - self.x[0]) / self.x[2]),
                round((self.y[1] - self.y[0]) / self.y[2]),
                round((self.z[1] - self.z[0]) / self.z[2]),
            ],
            np.int32,
        )

    @property
    def num_depth_bins(self) -> int:
        lo, hi, step = self.depth
        return int(np.ceil((hi - lo) / step - 1e-6))

    @property
    def num_voxels(self) -> int:
        sx, sy, sz = self.size
        return int(sx) * int(sy) * int(sz)


def create_frustum(
    grid: GridConfig,
    input_size: Tuple[int, int],
    downsample: int,
    sid: bool = False,
) -> np.ndarray:
    """Frustum template of (u, v, depth) per feature-map cell.

    Parity with reference `create_frustum` (`view_transformer.py:84-112`):
    depth bins arange(lo, hi, step); pixel coords linspace over the *input*
    resolution sampled at feature resolution. Returns (D, Hf, Wf, 3) float32.
    """
    h_in, w_in = input_size
    h_feat, w_feat = h_in // downsample, w_in // downsample
    lo, hi, step = grid.depth
    d = np.arange(lo, hi, step, dtype=np.float32)
    num_d = d.shape[0]
    if sid:
        # Spacing-Increasing Discretization (`view_transformer.py:100-105`).
        idx = np.arange(num_d, dtype=np.float32)
        d = np.exp(np.log(lo) + idx / (num_d - 1) * np.log((hi - 1.0) / lo)).astype(
            np.float32
        )
    d = np.broadcast_to(d[:, None, None], (num_d, h_feat, w_feat))
    x = np.linspace(0, w_in - 1, w_feat, dtype=np.float32)
    x = np.broadcast_to(x[None, None, :], (num_d, h_feat, w_feat))
    y = np.linspace(0, h_in - 1, h_feat, dtype=np.float32)
    y = np.broadcast_to(y[None, :, None], (num_d, h_feat, w_feat))
    return np.stack([x, y, d], axis=-1)


def frustum_to_lidar(
    frustum: jnp.ndarray,
    sensor2ego: jnp.ndarray,
    cam2img: jnp.ndarray,
    post_rot: jnp.ndarray,
    post_tran: jnp.ndarray,
    bda: jnp.ndarray,
) -> jnp.ndarray:
    """Project frustum (u, v, depth) points into (bda-augmented) key-ego space.

    Parity with reference `get_lidar_coor` (`view_transformer.py:114-153`):
      1. undo image-space augmentation: p = inv(post_rot) @ (frustum - post_tran)
      2. unproject: (u*d, v*d, d)
      3. cam->ego: sensor2ego[:3,:3] @ inv(cam2img) @ p + sensor2ego[:3,3]
      4. BEV augmentation: bda @ p

    Args:
      frustum:    (D, Hf, Wf, 3)
      sensor2ego: (B, N, 4, 4)
      cam2img:    (B, N, 3, 3)
      post_rot:   (B, N, 3, 3)
      post_tran:  (B, N, 3)
      bda:        (B, 3, 3)
    Returns:
      (B, N, D, Hf, Wf, 3) points in ego/lidar space.
    """
    B, N = sensor2ego.shape[:2]
    pts = frustum[None, None] - post_tran[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rot)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts)
    pts = jnp.concatenate(
        [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1
    )
    combine = sensor2ego[:, :, :3, :3] @ jnp.linalg.inv(cam2img)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
    pts = pts + sensor2ego[:, :, None, None, None, :3, 3]
    pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts)
    return pts


def voxel_indices(coor: jnp.ndarray, grid: GridConfig) -> jnp.ndarray:
    """Flattened voxel index per frustum point, with out-of-range -> sentinel.

    Re-design of `voxel_pooling_prepare_v2` (`view_transformer.py:203-261`) for
    static shapes: instead of boolean filtering + sort + interval compression,
    every point keeps its slot; invalid points get index `num_voxels` which the
    pooling op drops. Rank layout matches the reference's (B, Z, Y, X) order:
        rank = b*Z*Y*X + z*Y*X + y*X + x.

    Args:
      coor: (B, N, D, H, W, 3) ego-space points.
    Returns:
      (B, N, D, H, W) int32 in [0, B*Z*Y*X] (== sentinel when out of range).
    """
    B = coor.shape[0]
    lower = jnp.asarray(grid.lower)
    interval = jnp.asarray(grid.interval)
    size = grid.size
    sx, sy, sz = int(size[0]), int(size[1]), int(size[2])
    vox = jnp.floor((coor - lower) / interval).astype(jnp.int32)
    x, y, z = vox[..., 0], vox[..., 1], vox[..., 2]
    valid = (
        (x >= 0) & (x < sx) & (y >= 0) & (y < sy) & (z >= 0) & (z < sz)
    )
    batch_idx = jnp.arange(B, dtype=jnp.int32).reshape(
        (B,) + (1,) * (coor.ndim - 2)
    )
    rank = batch_idx * (sz * sy * sx) + z * (sy * sx) + y * sx + x
    sentinel = B * sz * sy * sx
    return jnp.where(valid, rank, sentinel)


def frustum_pixel_indices(
    batch: int, num_cams: int, num_depth: int, h_feat: int, w_feat: int
) -> np.ndarray:
    """Flattened (B*N*Hf*Wf) feature-pixel index for each frustum point.

    Equivalent to the reference's `ranks_feat` (`view_transformer.py:221-224`)
    — maps each (b, n, d, h, w) point to its (b, n, h, w) context pixel.
    Returns (B, N, D, Hf, Wf) int32.
    """
    pix = np.arange(batch * num_cams * h_feat * w_feat, dtype=np.int32).reshape(
        batch, num_cams, 1, h_feat, w_feat
    )
    return np.broadcast_to(
        pix, (batch, num_cams, num_depth, h_feat, w_feat)
    ).copy()
