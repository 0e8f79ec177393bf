"""Corner-expanded trilinear field sampling (the NeRF render hot path).

TPU gathers are DESCRIPTOR-rate-bound: the render's trilinear sampling
(reference `nerf_head.py:209-225`, torch `F.grid_sample`) costs 8 row
gathers per (ray, sample) — ~128M descriptors per pretrain forward at
38,400 rays x 417 samples, the dominant term of the round-1 16.9 s train
step. This module pre-expands the field into a table whose row i holds ALL
EIGHT interpolation corners of base cell i (8C contiguous channels), so each
sample needs exactly ONE gather descriptor of one contiguous 8C-float row.
Descriptor count drops 8x and every fetched byte is used.

The table is built once per scene per step (dense shifted-slice concat, HBM
bandwidth cost ~2 table sizes) and its gradient folds back to the field as a
sum of 8 shifted views — XLA keeps both dense.

Semantics match `grid_sample_3d(..., align_corners=True, zeros padding)` on
an (X, Y, Z, C) field with normalized xyz coords — oracled in
tests/test_ops.py against the general implementation.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def build_corner_table(field: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z, C) field -> ((X+1)(Y+1)(Z+1), 8C) corner-expanded table.

    Row layout: corner index c = dx*4 + dy*2 + dz (dx/dy/dz in {0,1}), each
    contributing C channels. Base cell (i, j, k) covers floor coords
    (i-1, j-1, k-1) of the UNPADDED field (a 1-voxel zero border reproduces
    torch zeros padding for partially out-of-range samples).
    """
    padded = jnp.pad(field, ((1, 1), (1, 1), (1, 1), (0, 0)))
    Xp, Yp, Zp, _ = padded.shape
    corners = [
        padded[dx : dx + Xp - 1, dy : dy + Yp - 1, dz : dz + Zp - 1]
        for dx in (0, 1)
        for dy in (0, 1)
        for dz in (0, 1)
    ]
    tab = jnp.concatenate(corners, axis=-1)  # (X+1, Y+1, Z+1, 8C)
    return tab.reshape(-1, tab.shape[-1])


def build_corner_table_2d(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) image -> ((H+1)(W+1), 4C) bilinear corner table.

    Row layout: corner c = dy*2 + dx. Same zero-border semantics as the 3D
    variant; used by the stereo cost volume's warp (one contiguous-row
    gather per sample instead of a (2,2,C) strided patch whose sublane
    padding inflates the gather output 8x in bf16).
    """
    padded = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    Hp, Wp, _ = padded.shape
    corners = [
        padded[dy : dy + Hp - 1, dx : dx + Wp - 1]
        for dy in (0, 1)
        for dx in (0, 1)
    ]
    tab = jnp.concatenate(corners, axis=-1)  # (H+1, W+1, 4C)
    return tab.reshape(-1, tab.shape[-1])


def sample_corner_table_2d(
    table: jnp.ndarray,
    hw: Tuple[int, int],
    x: jnp.ndarray,
    y: jnp.ndarray,
) -> jnp.ndarray:
    """Bilinear sample at PIXEL coords (x, y), zeros padding.

    Args: table from `build_corner_table_2d`; hw = (H, W); x, y (P,).
    Returns: (P, C).
    """
    H, W = hw
    C = table.shape[-1] // 4
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx = (x - x0).astype(table.dtype)
    fy = (y - y0).astype(table.dtype)
    xs = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    ys = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    rows = table[ys * (W + 1) + xs].reshape(-1, 4, C)
    w4 = jnp.stack(
        [(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx], axis=-1
    )
    out = jnp.einsum("pkc,pk->pc", rows, w4)
    valid = (x0 + 1 >= 0) & (x0 <= W - 1) & (y0 + 1 >= 0) & (y0 <= H - 1)
    return out * valid[:, None].astype(table.dtype)


def sample_corner_table(
    table: jnp.ndarray,
    dims_xyz: Tuple[int, int, int],
    pts_norm: jnp.ndarray,
) -> jnp.ndarray:
    """Trilinear-sample via the corner table.

    Args:
      table: from `build_corner_table` (rows of 8C).
      dims_xyz: (X, Y, Z) of the original field.
      pts_norm: (..., 3) normalized [-1, 1] xyz (align_corners=True).
    Returns:
      (..., C) interpolated values; exact zeros for fully out-of-range pts.
    """
    X, Y, Z = dims_xyz
    C8 = table.shape[-1]
    C = C8 // 8
    spatial = pts_norm.shape[:-1]
    p = pts_norm.reshape(-1, 3)

    x = (p[:, 0] + 1.0) * 0.5 * (X - 1)
    y = (p[:, 1] + 1.0) * 0.5 * (Y - 1)
    z = (p[:, 2] + 1.0) * 0.5 * (Z - 1)
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx = (x - x0).astype(table.dtype)
    fy = (y - y0).astype(table.dtype)
    fz = (z - z0).astype(table.dtype)

    # +1 shift into the zero-padded base grid, clipped to its extent
    xs = jnp.clip(x0 + 1, 0, X).astype(jnp.int32)
    ys = jnp.clip(y0 + 1, 0, Y).astype(jnp.int32)
    zs = jnp.clip(z0 + 1, 0, Z).astype(jnp.int32)
    idx = (xs * (Y + 1) + ys) * (Z + 1) + zs

    rows = table[idx].reshape(-1, 8, C)  # ONE descriptor per sample

    wx = jnp.stack([1 - fx, fx], axis=-1)  # (P, 2)
    wy = jnp.stack([1 - fy, fy], axis=-1)
    wz = jnp.stack([1 - fz, fz], axis=-1)
    w8 = (
        wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    ).reshape(-1, 8)

    out = jnp.einsum("pkc,pk->pc", rows, w8)
    valid = (
        (x0 + 1 >= 0) & (x0 <= X - 1)
        & (y0 + 1 >= 0) & (y0 <= Y - 1)
        & (z0 + 1 >= 0) & (z0 <= Z - 1)
    )
    out = out * valid[:, None].astype(table.dtype)
    return out.reshape(*spatial, C)
