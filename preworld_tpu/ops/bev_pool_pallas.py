"""Pallas TPU kernel for the lift-splat voxel scatter (BEVPoolv2).

Replaces the XLA scatter-add in `bev_pool` with an MXU-friendly segment sum:

  1. XLA side: sort frustum points by voxel id with (depth, pixel-index)
     as sort PAYLOADS (no post-sort permutation gathers), gather context
     rows from the small per-pixel table and multiply by depth -> vals
     (P, C) rows; searchsorted gives each output TILE's first point offset
     and its block count.
  2. Row packing: a (P, C) bf16 array has a lane-padded HBM layout
     (minor dim 32 -> 128), and Mosaic rejects HBM DMA slices that are not
     128-lane aligned — while the transposed (C, P) layout costs a ~1/3-of-
     prep transpose. Instead we pack g = 128 // C_slot consecutive points
     per row: vals (P/g, g*C_slot) and vox (g, P/g), so every DMA slice is
     exactly lane-tile aligned and the buffers stay compact.
  3. Kernel: grid over output tiles of V_TILE voxels. Each tile walks its
     OWN ceil(points/TB) chunks (double-buffered DMA pipeline — the voxel
     distribution is ~13x skewed, so a worst-case fixed window would waste
     that factor on the average tile). Per chunk, for each point parity
     j in [0, g): one-hot(vox_j == row) contracted on the MXU against the
     lane-group-masked value rows; a final constant fold matrix collapses
     the g lane groups into the C output channels (also on the MXU). The
     g masked matmuls cost the same MXU time as one C-wide matmul, because
     a C<128-wide matmul pads its lanes anyway.

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
    tile_row_starts_ref,  # scalar prefetch: (n_tiles,) int32, 128-row aligned
    tile_nblk_ref,  # scalar prefetch: (n_tiles,) int32, TB-point blocks
    vox_hbm,  # (g, P/g) int32 sorted voxel ids, row j = points == j (mod g)
    vals_hbm,  # (P/g, g*C_slot) sorted depth*feat, g points packed per row
    out_ref,  # (V_TILE, C) VMEM output tile
    vox_vmem,  # scratch (2, g, 128) int32 double-buffered chunk
    vals_vmem,  # scratch (2, 128, g*C_slot)
    sem,  # DMA semaphores (2, 2)
    *,
    V_TILE: int,
    C_SLOT: int,
):
    # The frustum's voxel-id distribution is heavily skewed (near tiles
    # hold ~10x the average), so a fixed per-tile window sized for the
    # worst tile wastes ~13x DMA + MXU on the average one. Instead each
    # tile walks only its OWN ceil(points/TB) blocks (dynamic fori_loop),
    # fetching 128-row chunks with a two-deep DMA pipeline.
    k = pl.program_id(0)
    row_start = pl.multiple_of(tile_row_starts_ref[k], 128)
    nblk = tile_nblk_ref[k]
    g = vox_vmem.shape[1]

    def chunk_dma(i, slot):
        off = pl.multiple_of(row_start + i * 128, 128)
        return (
            pltpu.make_async_copy(
                vox_hbm.at[:, pl.ds(off, 128)], vox_vmem.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                vals_hbm.at[pl.ds(off, 128), :], vals_vmem.at[slot],
                sem.at[slot, 1],
            ),
        )

    @pl.when(nblk > 0)
    def _():
        a, b = chunk_dma(0, 0)
        a.start()
        b.start()

    tile_base = k * V_TILE
    CL = vals_vmem.shape[2]  # g * C_SLOT
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (V_TILE, 128), 0)
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (128, CL), 1) // C_SLOT

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
        vox = vox_vmem[slot]  # (g, 128)
        vals = vals_vmem[slot]  # (128, CL)
        for j in range(g):
            # exact in bf16: one-hot entries are 0/1 and vals are already
            # bf16; accumulation stays f32 via preferred_element_type
            onehot = (vox[j : j + 1, :] - tile_base == row_ids).astype(
                vals.dtype
            )  # (V_TILE, 128)
            vj = jnp.where(lane_group == j, vals, 0)
            # acc[v, j*C_slot + c] += sum_q onehot[v, q] * val(gq+j)[c]
            acc = acc + jax.lax.dot_general(
                onehot,
                vj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(
        0, nblk, block, jnp.zeros((V_TILE, CL), jnp.float32)
    )
    # fold the g point-parity lane groups: out[v, c] = sum_j acc[v, j*C_slot+c]
    C = out_ref.shape[1]
    fold = (
        jax.lax.broadcasted_iota(jnp.int32, (CL, C), 0) % C_SLOT
        == jax.lax.broadcasted_iota(jnp.int32, (CL, C), 1)
    ).astype(jnp.float32)
    out_ref[:, :] = jax.lax.dot_general(
        acc,
        fold,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _pack_geometry(C: int):
    """(C_slot, g): channel slot width (pow2 >= C) and points per 128 lanes."""
    c_slot = 1
    while c_slot < C:
        c_slot *= 2
    if c_slot > 128:
        # wide channels: no packing; pad lanes to a 128 multiple
        return ((C + 127) // 128) * 128, 1
    return c_slot, 128 // c_slot


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
      pts_cap/tb: retained for API compatibility (the former fixed per-tile
               window / chunk size). The kernel walks each tile's own
               TB = g*128-point blocks, so skewed tiles (flagship peaks at
               ~13.4k points per 512-voxel tile vs ~1.2k average) no longer
               set every tile's cost.
    Returns: (num_voxels_padded, C); caller slices [:num_voxels].
    """
    del pts_cap, tb
    P, C = vals_sorted.shape
    c_slot, g = _pack_geometry(C)
    TB = 128 * g  # points per chunk
    nvox_pad = ((num_voxels + v_tile - 1) // v_tile) * v_tile
    n_tiles = nvox_pad // v_tile

    # pad points so any TB-aligned chunk walk fits; pad ids park in no tile
    P_pad = ((P + 3 * TB) // TB) * TB
    vox_p = jnp.concatenate(
        [vox_sorted, jnp.full((P_pad - P,), nvox_pad + 1, jnp.int32)]
    )
    vals_p = vals_sorted
    if c_slot != C:
        vals_p = jnp.pad(vals_p, ((0, 0), (0, c_slot - C)))
    vals_p = jnp.concatenate(
        [vals_p, jnp.zeros((P_pad - P, c_slot), vals_p.dtype)], axis=0
    )
    # pack: row q holds points g*q .. g*q+g-1, each in a c_slot lane group;
    # vox row j holds the ids of points == j (mod g)
    vals_packed = vals_p.reshape(P_pad // g, g * c_slot)
    vox_packed = vox_p.reshape(P_pad // g, g).T

    bounds = jnp.searchsorted(
        vox_sorted,
        jnp.arange(n_tiles + 1, dtype=jnp.int32) * v_tile,
    ).astype(jnp.int32)
    start_pts = (bounds[:-1] // TB) * TB  # chunk-aligned round-down
    tile_row_starts = start_pts // g  # 128-row aligned by construction
    tile_nblk = (bounds[1:] - start_pts + TB - 1) // TB

    kernel = functools.partial(_pool_kernel, V_TILE=v_tile, C_SLOT=c_slot)
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
                pltpu.VMEM((2, g, 128), jnp.int32),
                pltpu.VMEM((2, 128, g * c_slot), vals_sorted.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nvox_pad, C), vals_sorted.dtype),
        interpret=interpret,
    )(tile_row_starts, tile_nblk, vox_packed, vals_packed)
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
    # gone (the kernel consumes packed row chunks directly).
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
