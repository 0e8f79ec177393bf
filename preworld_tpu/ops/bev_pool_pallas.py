"""Pallas TPU kernel for the lift-splat voxel scatter (BEVPoolv2).

Replaces the XLA scatter-add in `bev_pool` with an MXU-friendly segment sum:

  1. XLA side: sort frustum points by voxel id, gather context rows and
     multiply by depth -> vals (C, P) [transposed so DMA windows slice the
     LANE-aligned minor axis]; searchsorted gives each output TILE's first
     point offset, rounded down to 128 so every dynamic DMA start is
     tile-aligned for Mosaic.
  2. Kernel: grid over output tiles of V_TILE voxels. Each step DMAs a
     fixed-capacity point window starting at its (scalar-prefetched) offset
     and accumulates with the ONE-HOT MATMUL trick: onehot(voxel==lane)
     contracted against the value window runs on the MXU instead of a
     serialized per-point scatter. Points outside the tile's voxel range
     one-hot to nothing, so only window STARTS are needed — no lengths.

The CUDA original (`bev_pool_cuda.cu:21-48`) walks rank-compressed intervals
with one thread per (voxel, channel); the one-hot matmul is the TPU-native
equivalent of that interval walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_kernel(
    tile_starts_ref,  # scalar prefetch: (n_tiles,) int32, 128-aligned starts
    vox_hbm,  # (1, P_pad) int32 sorted voxel ids
    vals_hbm,  # (C, P_pad) sorted depth*feat columns
    out_ref,  # (V_TILE, C) VMEM output tile
    vox_vmem,  # scratch (1, PTS_CAP) int32
    vals_vmem,  # scratch (C, PTS_CAP)
    sem,  # DMA semaphores (2,)
    *,
    V_TILE: int,
    PTS_CAP: int,
    TB: int,
):
    k = pl.program_id(0)
    start = pl.multiple_of(tile_starts_ref[k], 128)

    vox_dma = pltpu.make_async_copy(
        vox_hbm.at[:, pl.ds(start, PTS_CAP)], vox_vmem, sem.at[0]
    )
    vals_dma = pltpu.make_async_copy(
        vals_hbm.at[:, pl.ds(start, PTS_CAP)], vals_vmem, sem.at[1]
    )
    vox_dma.start()
    vals_dma.start()
    vox_dma.wait()
    vals_dma.wait()

    tile_base = k * V_TILE
    C = vals_vmem.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (V_TILE, TB), 0)

    def block(i, acc):
        sl = pl.ds(i * TB, TB)
        local = vox_vmem[:, sl] - tile_base  # (1, TB)
        onehot = (local == row_ids).astype(jnp.float32)  # (V_TILE, TB)
        vals = vals_vmem[:, sl].astype(jnp.float32)  # (C, TB)
        # acc[c, v] += sum_p vals[c, p] * onehot[v, p]
        return acc + jax.lax.dot_general(
            vals,
            onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, PTS_CAP // TB, block, jnp.zeros((C, V_TILE), jnp.float32)
    )
    out_ref[:, :] = acc.T.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_voxels", "v_tile", "pts_cap", "tb", "interpret"),
)
def bev_pool_pallas_sorted(
    vals_sorted_t: jnp.ndarray,
    vox_sorted: jnp.ndarray,
    num_voxels: int,
    v_tile: int = 512,
    pts_cap: int = 16384,
    tb: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum of pre-sorted columns into `num_voxels` buckets.

    Args:
      vals_sorted_t: (C, P) columns (depth*feat), sorted by voxel id.
      vox_sorted:  (P,) int32 ascending; out-of-range (dropped) points carry
                   id >= num_voxels and MUST sort to the tail.
      pts_cap: per-tile point window; must exceed the max number of points in
               any v_tile-voxel span plus the <=127 alignment slack
               (overflowing points would be silently dropped — the flagship
               geometry peaks at ~13.4k points per 512-voxel tile).
    Returns: (num_voxels_padded, C); caller slices [:num_voxels].
    """
    C, P = vals_sorted_t.shape
    nvox_pad = ((num_voxels + v_tile - 1) // v_tile) * v_tile
    n_tiles = nvox_pad // v_tile

    # pad points so any 128-aligned window fits; pad ids park in no tile
    pad = pts_cap + 128
    vox_p = jnp.concatenate(
        [vox_sorted, jnp.full((pad,), nvox_pad + 1, jnp.int32)]
    )[None, :]
    vals_p = jnp.concatenate(
        [vals_sorted_t, jnp.zeros((C, pad), vals_sorted_t.dtype)], axis=1
    )

    tile_starts = jnp.searchsorted(
        vox_sorted, jnp.arange(n_tiles, dtype=jnp.int32) * v_tile
    ).astype(jnp.int32)
    tile_starts = (tile_starts // 128) * 128  # Mosaic DMA lane alignment

    kernel = functools.partial(
        _pool_kernel, V_TILE=v_tile, PTS_CAP=pts_cap, TB=tb
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (v_tile, C), lambda k, starts: (k, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, pts_cap), jnp.int32),
                pltpu.VMEM((C, pts_cap), vals_sorted_t.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nvox_pad, C), vals_sorted_t.dtype),
        interpret=interpret,
    )(tile_starts, vox_p, vals_p)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bev_pool_fused(
    depth: jnp.ndarray,
    feat: jnp.ndarray,
    vox_idx: jnp.ndarray,
    pix_idx: jnp.ndarray,
    num_voxels: int,
    pts_cap: int = 16384,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `bev_pool.bev_pool` using the Pallas kernel.

    Custom VJP (structure of the CUDA backward, `bev_pool_cuda.cu:67-121`)
    but exploiting the frustum layout so NO scatter or un-sort is needed:
    with G = grad_out[vox] gathered in the ORIGINAL (b, n, d, h, w) order,
      d_depth = <G, feat>  per point (feat broadcast over depth bins),
      d_feat  = sum_d depth * G  (a plain reduction over the depth axis,
                because every depth bin of a pixel shares its feat row).
    """
    return _bev_pool_fused_fwd(
        depth, feat, vox_idx, pix_idx, num_voxels, pts_cap, interpret
    )[0]


def _bev_pool_fused_fwd(depth, feat, vox_idx, pix_idx, num_voxels, pts_cap,
                        interpret):
    C = feat.shape[-1]
    d = depth.reshape(-1)
    v = vox_idx.reshape(-1)
    p = pix_idx.reshape(-1)
    feat_flat = feat.reshape(-1, C)

    order = jnp.argsort(v)
    v_s = v[order]
    vals_t = (feat_flat[p[order]] * d[order][:, None]).T
    out = bev_pool_pallas_sorted(
        vals_t, v_s, num_voxels, pts_cap=pts_cap, interpret=interpret
    )
    return out[:num_voxels], (depth, feat, vox_idx)


def _bev_pool_fused_bwd(num_voxels, pts_cap, interpret, res, g):
    depth, feat, vox_idx = res
    B, N, D, H, W = depth.shape
    C = feat.shape[-1]
    g = g.astype(jnp.float32)
    valid = (vox_idx < num_voxels)[..., None]
    safe = jnp.clip(vox_idx, 0, num_voxels - 1)
    G = g[safe.reshape(-1)].reshape(B, N, D, H, W, C)
    G = jnp.where(valid, G, 0.0)
    d_depth = jnp.einsum("bndhwc,bnhwc->bndhw", G, feat.astype(jnp.float32))
    d_feat = jnp.einsum("bndhwc,bndhw->bnhwc", G, depth.astype(jnp.float32))
    return (
        d_depth.astype(depth.dtype),
        d_feat.astype(feat.dtype),
        None,
        None,
    )


bev_pool_fused.defvjp(
    lambda depth, feat, vox, pix, nv, cap, interp: _bev_pool_fused_fwd(
        depth, feat, vox, pix, nv, cap, interp
    ),
    _bev_pool_fused_bwd,
)
