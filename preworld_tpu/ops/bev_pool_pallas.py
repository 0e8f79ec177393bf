"""Pallas TPU kernel for the lift-splat voxel scatter (BEVPoolv2).

Replaces the XLA scatter-add in `bev_pool` with an MXU-friendly segment sum:

  1. XLA side: sort frustum points by voxel id with (depth, pixel-index)
     as sort PAYLOADS (no post-sort permutation gathers), gather context
     rows from the small per-pixel table and multiply by depth -> vals
     (P, C) rows; searchsorted gives each output TILE's first point offset
     (128-aligned for Mosaic DMA) and its block count.
  2. Kernel: grid over output tiles of V_TILE voxels. Each tile walks its
     OWN ceil(points/TB) chunks (double-buffered DMA pipeline — the voxel
     distribution is ~13x skewed, so a worst-case fixed window would waste
     that factor on the average tile) and accumulates with the ONE-HOT
     MATMUL trick: onehot(voxel==row) contracted against the chunk runs on
     the MXU instead of a serialized per-point scatter. Points outside the
     tile's voxel range one-hot to nothing, so chunk walks may overlap
     neighbouring tiles' points safely.

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
    tile_nblk_ref,  # scalar prefetch: (n_tiles,) int32, TB-blocks per tile
    vox_hbm,  # (1, P_pad) int32 sorted voxel ids
    vals_hbm,  # (P_pad, C) sorted depth*feat rows
    out_ref,  # (V_TILE, C) VMEM output tile
    vox_vmem,  # scratch (2, 1, TB) int32 double-buffered chunk
    vals_vmem,  # scratch (2, TB, C)
    sem,  # DMA semaphores (2, 2)
    *,
    V_TILE: int,
    TB: int,
):
    # The frustum's voxel-id distribution is heavily skewed (near tiles
    # hold ~10x the average), so a fixed per-tile window sized for the
    # worst tile wastes ~13x DMA + MXU on the average one. Instead each
    # tile walks only its OWN ceil(points/TB) blocks (dynamic fori_loop),
    # fetching (C, TB) chunks with a two-deep DMA pipeline.
    k = pl.program_id(0)
    start = pl.multiple_of(tile_starts_ref[k], 128)
    nblk = tile_nblk_ref[k]

    def chunk_dma(i, slot):
        off = pl.multiple_of(start + i * TB, 128)
        return (
            pltpu.make_async_copy(
                vox_hbm.at[:, pl.ds(off, TB)], vox_vmem.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                vals_hbm.at[pl.ds(off, TB), :], vals_vmem.at[slot],
                sem.at[slot, 1],
            ),
        )

    @pl.when(nblk > 0)
    def _():
        a, b = chunk_dma(0, 0)
        a.start()
        b.start()

    tile_base = k * V_TILE
    C = vals_vmem.shape[2]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (V_TILE, TB), 0)

    def block(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nblk)
        def _():
            a, b = chunk_dma(i + 1, jax.lax.rem(i + 1, 2))
            a.start()
            b.start()

        a, b = chunk_dma(i, slot)
        a.wait()
        b.wait()
        local = vox_vmem[slot] - tile_base  # (1, TB)
        # exact in bf16: one-hot entries are 0/1 and vals are already bf16;
        # accumulation stays f32 via preferred_element_type
        onehot = (local == row_ids).astype(vals_vmem.dtype)  # (V_TILE, TB)
        vals = vals_vmem[slot]  # (TB, C)
        # acc[v, c] += sum_p onehot[v, p] * vals[p, c]
        return acc + jax.lax.dot_general(
            onehot,
            vals,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, nblk, block, jnp.zeros((V_TILE, C), jnp.float32)
    )
    out_ref[:, :] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_voxels", "v_tile", "pts_cap", "tb", "interpret"),
)
def bev_pool_pallas_sorted(
    vals_sorted: jnp.ndarray,
    vox_sorted: jnp.ndarray,
    num_voxels: int,
    v_tile: int = 512,
    pts_cap: int = 16384,
    tb: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum of pre-sorted rows into `num_voxels` buckets.

    Args:
      vals_sorted: (P, C) rows (depth*feat), sorted by voxel id.
      vox_sorted:  (P,) int32 ascending; out-of-range (dropped) points carry
                   id >= num_voxels and MUST sort to the tail.
      pts_cap: retained for API compatibility (the former fixed per-tile
               window). The kernel now walks each tile's own blocks, so
               skewed tiles (flagship peaks at ~13.4k points per 512-voxel
               tile vs ~1.2k average) no longer set every tile's cost.
    Returns: (num_voxels_padded, C); caller slices [:num_voxels].
    """
    del pts_cap
    P, C = vals_sorted.shape
    nvox_pad = ((num_voxels + v_tile - 1) // v_tile) * v_tile
    n_tiles = nvox_pad // v_tile

    # pad points so any 128-aligned chunk walk fits; pad ids park in no tile
    pad = 2 * tb + 128
    vox_p = jnp.concatenate(
        [vox_sorted, jnp.full((pad,), nvox_pad + 1, jnp.int32)]
    )[None, :]
    vals_p = jnp.concatenate(
        [vals_sorted, jnp.zeros((pad, C), vals_sorted.dtype)], axis=0
    )

    bounds = jnp.searchsorted(
        vox_sorted,
        jnp.arange(n_tiles + 1, dtype=jnp.int32) * v_tile,
    ).astype(jnp.int32)
    tile_starts = (bounds[:-1] // 128) * 128  # Mosaic DMA lane alignment
    tile_nblk = (bounds[1:] - tile_starts + tb - 1) // tb

    kernel = functools.partial(_pool_kernel, V_TILE=v_tile, TB=tb)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (v_tile, C), lambda k, starts, nblk: (k, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 1, tb), jnp.int32),
                pltpu.VMEM((2, tb, C), vals_sorted.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nvox_pad, C), vals_sorted.dtype),
        interpret=interpret,
    )(tile_starts, tile_nblk, vox_p, vals_p)
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

    # sort carries (depth, pixel) as payloads, so no post-sort permutation
    # gathers are needed; feat rows then gather from the SMALL per-pixel
    # table (VMEM-stageable -> fast descriptor path) in row layout — the
    # (C, P) transpose the previous pipeline paid ~1/3 of its time for is
    # gone (the kernel consumes (TB, C) row chunks directly).
    v_s, d_s, p_s = jax.lax.sort((v, d, p), num_keys=1)
    vals = feat_flat[p_s] * d_s[:, None]
    out = bev_pool_pallas_sorted(
        vals, v_s, num_voxels, pts_cap=pts_cap, interpret=interpret
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
