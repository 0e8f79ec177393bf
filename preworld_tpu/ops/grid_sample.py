"""Bilinear / trilinear grid sampling with torch `F.grid_sample` parity.

Used by (reference call sites):
  * stereo cost-volume homography warp (`view_transformer.py:591-593`,
    align_corners=True, padding_mode='zeros')
  * BEV temporal alignment `shift_feature` (`bevdet.py:358-362`,
    align_corners=True)
  * NeRF trilinear field sampling (`nerf_head.py:213-225`, align_corners=True)

TPU note: interpolation corners are fetched as ROW gathers of whole channel
vectors from a (spatial, C) table — XLA lowers that to contiguous-slice
gathers (hundreds of bytes per descriptor) instead of per-element scalar
gathers, which is the difference between HBM-bandwidth-bound and
descriptor-bound on TPU. Zero-padding is done by clamping indices and
masking the corner weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    """Map [-1, 1] -> pixel coords, matching torch grid_sample conventions."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _row_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, S, C) table + (B, P) int32 -> (B, P, C) row gather (vmapped)."""
    return jax.vmap(lambda t, i: t[i])(table, idx)


def _patch_gather_2x2(table: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray):
    """Gather (2, 2, C) patches from a zero-padded (H+2, W+2, C) table.

    One gather descriptor per bilinear sample (instead of four): TPU gathers
    are descriptor-rate-bound, so fetching the whole interpolation footprint
    per descriptor is ~4x faster. `y0`/`x0` are UNPADDED floor indices; the
    +1 shift lands out-of-range corners on the zero border, reproducing
    torch's zeros padding exactly.
    """
    Hp, Wp, C = table.shape  # H+2, W+2
    ys = jnp.clip(y0 + 1, 0, Hp - 2).astype(jnp.int32)
    xs = jnp.clip(x0 + 1, 0, Wp - 2).astype(jnp.int32)
    starts = jnp.stack([ys, xs], axis=-1)  # (P, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        table,
        starts,
        dnums,
        slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (P, 2, 2, C)


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
    Ho, Wo = grid.shape[1:3]
    x = _unnormalize(grid[..., 0].reshape(B, -1), W, align_corners)
    y = _unnormalize(grid[..., 1].reshape(B, -1), H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(input.dtype)
    fy = (y - y0).astype(input.dtype)

    # zero-pad 1 px so the +1-shifted patch covers every in/partially-out case
    table = jnp.pad(
        input.transpose(0, 2, 3, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )  # (B, H+2, W+2, C)

    patches = jax.vmap(_patch_gather_2x2)(
        table, y0.astype(jnp.int32), x0.astype(jnp.int32)
    )  # (B, P, 2, 2, C)

    wy = jnp.stack([1 - fy, fy], axis=-1)  # (B, P, 2)
    wx = jnp.stack([1 - fx, fx], axis=-1)
    out = jnp.einsum("bpyxc,bpy,bpx->bpc", patches, wy, wx)

    # far-out samples whose clipped patch would alias real data: both corners
    # on an axis out of range -> result is exactly 0 in torch
    valid = (
        (x0 + 1 >= 0) & (x0 <= W - 1) & (y0 + 1 >= 0) & (y0 <= H - 1)
    )
    out = out * valid[..., None].astype(input.dtype)
    return out.transpose(0, 2, 1).reshape(B, C, Ho, Wo)


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

    fx = fx.astype(input.dtype)
    fy = fy.astype(input.dtype)
    fz = fz.astype(input.dtype)

    if C >= 64:
        # wide channels: one (2,2,2,C) patch gather per sample over a
        # zero-padded table (see _patch_gather_2x2) — descriptor-optimal
        table = jnp.pad(
            input.transpose(0, 2, 3, 4, 1),
            ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
        )  # (B, D+2, H+2, W+2, C)

        def gather_one(tbl, zi, yi, xi):
            Dp, Hp, Wp, Cc = tbl.shape
            zs = jnp.clip(zi + 1, 0, Dp - 2).astype(jnp.int32)
            ys = jnp.clip(yi + 1, 0, Hp - 2).astype(jnp.int32)
            xs = jnp.clip(xi + 1, 0, Wp - 2).astype(jnp.int32)
            starts = jnp.stack([zs, ys, xs], axis=-1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3, 4),
                collapsed_slice_dims=(),
                start_index_map=(0, 1, 2),
            )
            return jax.lax.gather(
                tbl, starts, dnums, slice_sizes=(2, 2, 2, Cc),
                mode=jax.lax.GatherScatterMode.CLIP,
            )  # (P, 2, 2, 2, C)

        patches = jax.vmap(gather_one)(
            table, z0.astype(jnp.int32), y0.astype(jnp.int32),
            x0.astype(jnp.int32),
        )
        wz = jnp.stack([1 - fz, fz], axis=-1)
        wy = jnp.stack([1 - fy, fy], axis=-1)
        wx = jnp.stack([1 - fx, fx], axis=-1)
        out = jnp.einsum("bpzyxc,bpz,bpy,bpx->bpc", patches, wz, wy, wx)
        valid = (
            (x0 + 1 >= 0) & (x0 <= W - 1)
            & (y0 + 1 >= 0) & (y0 <= H - 1)
            & (z0 + 1 >= 0) & (z0 <= D - 1)
        )
        out = out * valid[..., None].astype(input.dtype)
        return out.transpose(0, 2, 1).reshape(B, C, *spatial)

    # narrow channels (e.g. the 21-ch fused NeRF field): patch outputs pad
    # their trailing (2, C) dims to TPU (8, 128) tiles — a 16-64x memory
    # blowup — so fetch the 8 corners as plain row gathers instead; XLA
    # schedules the corner buffers sequentially
    table = input.reshape(B, C, D * H * W).transpose(0, 2, 1)  # (B, DHW, C)

    def corner(xi, yi, zi, w):
        inb = (
            (xi >= 0) & (xi <= W - 1)
            & (yi >= 0) & (yi <= H - 1)
            & (zi >= 0) & (zi <= D - 1)
        )
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        zc = jnp.clip(zi, 0, D - 1).astype(jnp.int32)
        idx = (zc * H + yc) * W + xc
        vals = jax.vmap(lambda t, i: t[i])(table, idx)  # (B, P, C)
        return vals * (w * inb).astype(input.dtype)[..., None]

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
    return out.transpose(0, 2, 1).reshape(B, C, *spatial)
