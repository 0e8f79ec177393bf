"""Bilinear / trilinear grid sampling with torch `F.grid_sample` parity.

Used by (reference call sites):
  * stereo cost-volume homography warp (`view_transformer.py:591-593`,
    align_corners=True, padding_mode='zeros')
  * BEV temporal alignment `shift_feature` (`bevdet.py:358-362`,
    align_corners=True)
  * NeRF trilinear field sampling (`nerf_head.py:213-225`, align_corners=True)

Implemented as pure gathers + lerps so XLA fuses them; zero-padding is done by
clamping indices and masking the corner weights.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    """Map [-1, 1] -> pixel coords, matching torch grid_sample conventions."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample (bilinear, zeros padding) equivalent.

    Args:
      input: (B, C, H, W)
      grid:  (B, Ho, Wo, 2) normalized (x, y) in [-1, 1].
    Returns:
      (B, C, Ho, Wo)
    """
    B, C, H, W = input.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(xi, yi, wx, wy):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        # vals: (B, Ho, Wo, C) via per-batch gather
        flat = input.reshape(B, C, H * W)
        idx = yc * W + xc  # (B, Ho, Wo)
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, 1, -1), axis=2
        ).reshape(B, C, *idx.shape[1:])
        w = (wx * wy * inb).astype(input.dtype)
        return vals * w[:, None]

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out


def grid_sample_3d(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """torch grid_sample 3-D (trilinear, zeros padding) equivalent.

    Args:
      input: (B, C, D, H, W)
      grid:  (B, *S, 3) normalized (x, y, z) with x indexing W, y -> H, z -> D
             (torch convention: last dim of grid reversed w.r.t. input dims).
    Returns:
      (B, C, *S)
    """
    B, C, D, H, W = input.shape
    spatial = grid.shape[1:-1]
    g = grid.reshape(B, -1, 3)
    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)
    z = _unnormalize(g[..., 2], D, align_corners)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0

    flat = input.reshape(B, C, D * H * W)

    def corner(xi, yi, zi, w):
        inb = (
            (xi >= 0)
            & (xi <= W - 1)
            & (yi >= 0)
            & (yi <= H - 1)
            & (zi >= 0)
            & (zi <= D - 1)
        )
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        zc = jnp.clip(zi, 0, D - 1).astype(jnp.int32)
        idx = (zc * H + yc) * W + xc  # (B, P)
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # (B, C, P)
        return vals * (w * inb).astype(input.dtype)[:, None, :]

    out = (
        corner(x0, y0, z0, (1 - fx) * (1 - fy) * (1 - fz))
        + corner(x0 + 1, y0, z0, fx * (1 - fy) * (1 - fz))
        + corner(x0, y0 + 1, z0, (1 - fx) * fy * (1 - fz))
        + corner(x0 + 1, y0 + 1, z0, fx * fy * (1 - fz))
        + corner(x0, y0, z0 + 1, (1 - fx) * (1 - fy) * fz)
        + corner(x0 + 1, y0, z0 + 1, fx * (1 - fy) * fz)
        + corner(x0, y0 + 1, z0 + 1, (1 - fx) * fy * fz)
        + corner(x0 + 1, y0 + 1, z0 + 1, fx * fy * fz)
    )
    return out.reshape(B, C, *spatial)
