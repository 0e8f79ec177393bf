"""Ego-motion alignment of cached BEV/voxel features (streaming inference).

Parity: `BEVDet4D.gen_grid` + `shift_feature` (`bevdet.py:291-362`): warp the
previous frame's BEV feature into the current key-ego frame with a planar
(x, y) homography derived from the two sensor2keyego chains (+ bda). The
reference uses it for `align_after_view_transfromation` and for the
`sequential` cached-feature inference path (`bevdet.py:373-396`); here it
powers `PreWorld.predict_sequential`.

Voxel grids are channel-last (B, Z, Y, X, C); the warp is shared across Z
(the reference drops the z row/col from the 4x4, `bevdet.py:336-338`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.frustum import GridConfig
from ..ops.grid_sample import grid_sample_2d


def ego_motion_grid(
    curr_s2keyego: jnp.ndarray,
    prev_s2keyego: jnp.ndarray,
    bda: jnp.ndarray,
    grid: GridConfig,
):
    """Normalized sampling grid (B, Y, X, 2) mapping current BEV cells into
    the previous frame's BEV feature (`gen_grid`, `bevdet.py:291-356`).

    Args:
      curr_s2keyego / prev_s2keyego: (B, N, 4, 4) camera-0 poses are used
        (`bevdet.py:310-313`).
      bda: (B, 3, 3).
    """
    B = curr_s2keyego.shape[0]
    sx, sy, _ = (int(v) for v in grid.size)

    c02l0 = curr_s2keyego[:, 0:1]
    c12l0 = prev_s2keyego[:, 0:1]
    bda4 = jnp.zeros((B, 1, 4, 4), curr_s2keyego.dtype)
    bda4 = bda4.at[:, :, :3, :3].set(bda[:, None])
    bda4 = bda4.at[:, :, 3, 3].set(1.0)
    c02l0 = bda4 @ c02l0
    c12l0 = bda4 @ c12l0
    l02l1 = (c02l0 @ jnp.linalg.inv(c12l0))[:, 0]  # (B, 4, 4)
    # drop the z row/col: planar warp (`bevdet.py:336-338`)
    keep = jnp.asarray([0, 1, 3])
    l02l1 = l02l1[:, keep][:, :, keep]  # (B, 3, 3)

    feat2bev = jnp.asarray(
        [
            [grid.interval[0], 0.0, grid.lower[0]],
            [0.0, grid.interval[1], grid.lower[1]],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    tf = jnp.linalg.inv(feat2bev)[None] @ l02l1 @ feat2bev[None]

    xs = jnp.arange(sx, dtype=jnp.float32)
    ys = jnp.arange(sy, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # (Y, X)
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # (Y*X, 3)
    warped = jnp.einsum("bij,pj->bpi", tf, pts)
    norm = jnp.asarray([sx - 1.0, sy - 1.0], jnp.float32)
    g = warped[..., :2] / norm * 2.0 - 1.0
    return g.reshape(B, sy, sx, 2)


def shift_voxel_feature(
    feat: jnp.ndarray,
    curr_s2keyego: jnp.ndarray,
    prev_s2keyego: jnp.ndarray,
    bda: jnp.ndarray,
    grid: GridConfig,
) -> jnp.ndarray:
    """Warp a (B, Z, Y, X, C) voxel feature by planar ego motion
    (`shift_feature`, `bevdet.py:358-362`; align_corners=True)."""
    B, Z, Y, X, C = feat.shape
    g = ego_motion_grid(curr_s2keyego, prev_s2keyego, bda, grid)
    inp = feat.transpose(0, 1, 4, 2, 3).reshape(B, Z * C, Y, X)
    out = grid_sample_2d(inp, g, align_corners=True)
    return out.reshape(B, Z, C, Y, X).transpose(0, 1, 3, 4, 2)
