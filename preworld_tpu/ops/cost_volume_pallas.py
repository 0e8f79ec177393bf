"""Pallas plane-sweep cost-volume kernel (stereo depth warping).

STATUS: experimental alternative to `models.depthnet.stereo_cost_volume`.
Measured on one v5e chip at flagship scale: 507 ms f32 (1.45x the XLA
gather path) but 461 ms bf16 (parity with the patch-gather XLA path), so
the XLA path stays the default. The kernel trades gather descriptors for a
dense one-hot contraction (~40 TFLOP of inflated matmul); beating the
gather path needs either per-step DMA double-buffering + narrower windows
or exploiting the 2-nonzero structure of the interpolation rows. (Note:
narrower W tiles are not an option — Pallas requires lane-divisible block
widths, and W-major retiling shifts the cost into the VPU stage.) Numerics:
exact on in-window samples; ~2.7% of border/epipole samples fall outside
the static window and render as zeros+bias (validated against the XLA
oracle at realistic stereo geometry).

Approach (vs the XLA gather path of stereo_cost_volume):
TPU gathers are descriptor-rate-bound (~60 M/s), and the plane sweep needs
23.8 M bilinear samples per frame. This kernel exploits the warp's spatial
coherence: within one (8, 128) output tile at a fixed depth plane, the
source footprint of the homography is a small window (the per-depth
translation is large but the within-tile Jacobian is ~identity), so each
grid step

  1. DMAs the source WINDOW (WW x WH x C) into VMEM (origin scalar-prefetched,
     computed from per-tile coordinate minima on the XLA side),
  2. builds soft one-hot interpolation matrices from the in-tile coordinates
     (2 nonzeros per row = the bilinear weights; out-of-window coords match
     no column and contribute 0, reproducing zeros padding), and
  3. contracts them against the window on the MXU:
        T1[p, (y c)] = ox[p, x] @ win[(x), (y c)]
        interp[p, c] = sum_y oy[p, y] * T1[p, y, c]
     then cost[p] = sum_c |curr[p, c] - interp[p, c]| (+ bias when the warp
     sampled nothing, parity with `view_transformer.py:599-601`).

The source image is pre-transposed to (W, H, C) so the window DMA slices the
un-tiled major axis with a free x-origin; the y-origin is rounded to the
sublane tile and absorbed by window slack. No VJP: the reference computes
the cost volume under torch.no_grad (`view_transformer.py:630-631`), and the
callers stop gradients accordingly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output tile (TH, TW) over (H, W); window (WW, WH) over source (x, y)
TH, TW = 8, 128
WW, WH = 192, 32


def _cv_kernel(
    x0_ref,  # scalar prefetch (n_steps,) int32 window x origins
    y0_ref,  # scalar prefetch (n_steps,) int32 window y origins (16-aligned)
    prev_hbm,  # (BN, Wp, H, C) source features, W-major
    xc_ref,  # (1, 1, TH, TW) pixel x coords of this tile
    yc_ref,  # (1, 1, TH, TW)
    curr_ref,  # (1, TH, TW, C) current-frame features
    out_ref,  # (1, 1, TH, TW) cost tile
    win,  # scratch VMEM (WW, WH, C)
    acc,  # scratch VMEM (P, C) f32 interpolation accumulator
    sem,
    *,
    D: int,
    n_th: int,
    n_tw: int,
    bias: float,
):
    bn = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    d = pl.program_id(3)
    step = ((bn * n_th + th) * n_tw + tw) * D + d
    x0 = x0_ref[step]
    y0 = pl.multiple_of(y0_ref[step], 16)

    dma = pltpu.make_async_copy(
        prev_hbm.at[bn, pl.ds(x0, WW), pl.ds(y0, WH), :], win, sem
    )
    dma.start()

    P = TH * TW
    C = curr_ref.shape[-1]
    # build the soft one-hots in (TH, TW, S) form, then merge the leading
    # dims into sublanes — the reshape pattern Mosaic supports
    xl = xc_ref[0, 0][:, :, None] - x0.astype(jnp.float32)  # (TH, TW, 1)
    yl = yc_ref[0, 0][:, :, None] - y0.astype(jnp.float32)
    xf = jnp.floor(xl)
    yf = jnp.floor(yl)
    fx = xl - xf
    fy = yl - yf

    cols_x = jax.lax.broadcasted_iota(jnp.int32, (TH, TW, WW), 2).astype(
        jnp.float32
    )
    cols_y = jax.lax.broadcasted_iota(jnp.int32, (TH, TW, WH), 2).astype(
        jnp.float32
    )
    ox = ((cols_x == xf) * (1.0 - fx) + (cols_x == xf + 1.0) * fx).reshape(
        P, WW
    )
    oy = ((cols_y == yf) * (1.0 - fy) + (cols_y == yf + 1.0) * fy).reshape(
        P, WH
    )

    dma.wait()
    # contract x on the MXU in y-chunks (inputs in the source dtype — bf16
    # in the flagship — with f32 accumulation); bilinear y-weights applied
    # as static lane slices, which measured cheaper than either a (P, YC, C)
    # reshape or a single whole-window matmul
    YC = 4
    acc[:, :] = jnp.zeros((P, C), jnp.float32)
    oxc = ox.astype(win.dtype)
    for j in range(WH // YC):
        tbl_j = win[:, j * YC : (j + 1) * YC, :].reshape(WW, YC * C)
        t1 = jax.lax.dot_general(
            oxc, tbl_j,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, YC*C)
        upd = jnp.zeros((P, C), jnp.float32)
        for k in range(YC):
            w_k = jax.lax.slice_in_dim(oy, j * YC + k, j * YC + k + 1, axis=1)
            upd = upd + t1[:, k * C : (k + 1) * C] * w_k
        acc[:, :] += upd
    interp = acc[:, :]

    curr = curr_ref[0].astype(jnp.float32).reshape(P, C)
    cost = jnp.abs(curr - interp).sum(axis=1, keepdims=True)  # (P, 1)
    invalid = (interp[:, :1] == 0.0).astype(jnp.float32)
    cost = cost + invalid * bias
    out_ref[0, 0] = cost.reshape(TH, TW)


@functools.partial(jax.jit, static_argnames=("bias", "interpret"))
def plane_sweep_cost(
    prev_feat: jnp.ndarray,
    curr_feat: jnp.ndarray,
    grid: jnp.ndarray,
    bias: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas counterpart of `stereo_cost_volume` (pre-softmax cost).

    Args:
      prev_feat, curr_feat: (BN, H, W, C) stereo features.
      grid: (BN, D*H, W, 2) normalized sampling coords (gen_stereo_grid).
      bias: added where the warp sampled outside the previous image.
    Returns:
      (BN, D, H, W) float32 cost (caller applies softmax(-cost) over D).
    """
    BN, H, W, C = prev_feat.shape
    D = grid.shape[1] // H
    Wp = ((W + TW - 1) // TW) * TW
    n_th, n_tw = H // TH, Wp // TW

    # pixel coords (align_corners=True convention, grid_sample parity)
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    gx = gx.reshape(BN, D, H, W)
    gy = gy.reshape(BN, D, H, W)
    pad_w = Wp - W
    if pad_w:
        # padded columns: huge positive coords match nothing and keep the
        # per-tile min (window origin) driven by the real samples
        gx = jnp.pad(gx, ((0, 0),) * 3 + ((0, pad_w),), constant_values=1e9)
        gy = jnp.pad(gy, ((0, 0),) * 3 + ((0, pad_w),), constant_values=1e9)
        curr_feat = jnp.pad(curr_feat, ((0, 0), (0, 0), (0, pad_w), (0, 0)))

    # per-(bn, th, tw, d) window origins from tile minima; the window must
    # cover [min, min + span]: x free origin, y rounded down to the sublane
    # tile (slack absorbed by WH)
    tx = gx.reshape(BN, D, n_th, TH, n_tw, TW)
    ty = gy.reshape(BN, D, n_th, TH, n_tw, TW)
    # anchor windows on IN-IMAGE samples only: a tile mixing far-out points
    # (which render as zeros anyway) with in-image ones must not drag the
    # window away from the real data
    in_img = (tx > -1.0) & (tx < W) & (ty > -1.0) & (ty < H)
    big = jnp.float32(1e9)
    xmin = jnp.floor(jnp.where(in_img, tx, big).min(axis=(3, 5))) - 1.0
    ymin = jnp.floor(jnp.where(in_img, ty, big).min(axis=(3, 5))) - 1.0
    x0 = jnp.clip(xmin, 0, max(W - WW, 0)).astype(jnp.int32)
    y0 = jnp.clip(ymin, 0, max(H - WH, 0)).astype(jnp.int32)
    y0 = (y0 // 16) * 16
    # step order (bn, th, tw, d)
    x0 = x0.transpose(0, 2, 3, 1).reshape(-1)
    y0 = y0.transpose(0, 2, 3, 1).reshape(-1)

    # W-major source table; pad so any clipped window fits
    prev_t = prev_feat.transpose(0, 2, 1, 3)  # (BN, W, H, C)
    if W < WW:
        prev_t = jnp.pad(prev_t, ((0, 0), (0, WW - W), (0, 0), (0, 0)))
    if H < WH:
        prev_t = jnp.pad(prev_t, ((0, 0), (0, 0), (0, WH - H), (0, 0)))

    kernel = functools.partial(
        _cv_kernel, D=D, n_th=n_th, n_tw=n_tw, bias=float(bias)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BN, n_th, n_tw, D),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, 1, TH, TW),
                    lambda bn, th, tw, d, *_: (bn, d, th, tw),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, TH, TW),
                    lambda bn, th, tw, d, *_: (bn, d, th, tw),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TH, TW, C),
                    lambda bn, th, tw, d, *_: (bn, th, tw, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, TH, TW),
                lambda bn, th, tw, d, *_: (bn, d, th, tw),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((WW, WH, C), prev_feat.dtype),
                pltpu.VMEM((TH * TW, C), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((BN, D, H, Wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x0, y0, prev_t, gx, gy, curr_feat)
    return out[..., :W]
