"""Fused Pallas plane-sweep cost volume (stereo depth warping), round 3.

Replaces both the XLA gather path (`models.depthnet.stereo_cost_volume*`,
descriptor-rate-bound at ~235 ms/pair on v5e) and the round-2 experimental
kernel (per-(tile,depth) window DMAs + full-window one-hot matmuls: 38 GB of
window traffic and ~40 TFLOP of inflated contraction, 461 ms). Measured
geometry at flagship scale (see docs/ROUND3_STATUS.md) shows why a much
cheaper structure is exact enough:

  * the full 352-px source WIDTH fits one lane-padded window, so windows
    only move in y — and a single (WH=48)-row band covers ALL 88 depth
    planes of an output tile for almost every tile (mean ~1.0-1.5 window
    loads per tile even at 7 m/frame ego motion);
  * within one 8x128 output tile at one depth, the warp's x-footprint is
    ~tile width (p99 < 200 px), so the one-hot x-contraction only needs a
    dynamically-sliced SW=256 sub-window, not the whole row;
  * within one output ROW the y-footprint spans <~3 px, so NY=4 window
    rows combined with per-pixel tent weights reproduce exact bilinear
    interpolation (tent weight max(0, 1-|y - row|) IS the bilinear weight
    of the two adjacent rows and zero elsewhere);
  * 4-21% of (tile, depth) planes warp fully out of the previous image —
    those skip all compute via a prefetched row mask and write the exact
    reference fallback sum_c|curr| + bias directly.

Per (tile, depth) step the kernel runs 8 rows x NY=4 MXU contractions
win[yrow, xs:xs+SW, :]^T @ onehot_x -> (C, TW): pixels ride the LANE dim and
channels the sublane dim, so the final sum_c |curr - interp| reduction lands
lane-major and writes straight to the output row — no per-row transposes.
HBM traffic: one (48, Wp, C) window DMA per tile segment (~0.9 GB/pair vs
24 GB of gather rows), plus coords and output.

Numerics: exact grid_sample(align_corners=True, zeros) semantics for
samples whose corners fall inside the window/NY rows (out-of-image corners
contribute zero through one-hot/tent mismatch, exactly like zeros padding);
samples beyond the window (p99.9 tail of extreme warps) render as
zeros+bias, same documented fallback class as round 2 and validated against
the XLA oracle at realistic stereo geometry. No VJP: the reference computes
the cost volume under torch.no_grad (`view_transformer.py:630-631`).

Reference semantics: `mmdet3d/models/necks/view_transformer.py:576-604`
(abs-diff over ALL channels, bias where the warp sampled nothing, caller
softmaxes -cost over depth).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 8, 128  # output tile (rows, lane-width)
NY = 4           # window rows combined per output row (tent-weighted)


def _cv_kernel(
    info_ref,   # scalar prefetch (n_steps,) int32 packed per-(tile,d) info
    xs16_ref,   # scalar prefetch (n_steps,) int32: 8 x 4-bit row x-starts/16
    y0d_ref,    # scalar prefetch (n_steps,) int32: 8 x 4-bit row y deltas
    prev_hbm,   # (BN, H, Wp, C) source features (x lane-padded)
    xc_ref,     # (1, D, TH, TW) pixel x coords of this tile, all depths
    yc_ref,     # (1, D, TH, TW)
    curr_ref,   # (1, TH, C, TW) current-frame features, channel-sublane
    out_ref,    # (1, D, TH, TW) f32 cost tile, all depths
    win,        # scratch VMEM (WH, Wp, C): y-band window
    sem,
    *,
    D, n_th, n_tw, W, H, Wp, SW, WH, bias,
):
    # one grid step per output TILE with an in-kernel loop over all D
    # depth planes: per-step pipeline overhead at (tile, depth) grain
    # measured ~4.5 us/step x 25k steps — the depth loop amortizes it 88x
    bn = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    base = ((bn * n_th + th) * n_tw + tw) * D

    iota_f = jax.lax.broadcasted_iota(jnp.int32, (SW, TW), 0).astype(
        jnp.float32
    )
    iota_ny = jax.lax.broadcasted_iota(jnp.int32, (NY, 1, 1), 0).astype(
        jnp.float32
    )
    # depth-invariant per-row values, hoisted out of the depth loop
    curr_rows = [curr_ref[0, r].astype(jnp.float32) for r in range(TH)]
    l1_rows = [
        jnp.sum(jnp.abs(c), axis=0, keepdims=True) for c in curr_rows
    ]
    l1_tile = jnp.concatenate(l1_rows, axis=0)  # (TH, TW)

    def one_depth(d, _):
        info = info_ref[base + d]
        xs16 = xs16_ref[base + d]
        y0d = y0d_ref[base + d]
        rowmask = info & 0xFF
        new = (info >> 8) & 1
        y0 = (info >> 9) & 0x7F
        y0r_base = (info >> 16) & 0x3F

        @pl.when(new == 1)
        def _():
            cp = pltpu.make_async_copy(
                prev_hbm.at[bn, pl.ds(y0, WH)], win, sem
            )
            cp.start()
            cp.wait()

        # Per-ROW predication measured ~0.35 us/row of pure control overhead
        # (405k pl.when bodies/pair = half the kernel's runtime; the noMM
        # bisection in docs/ROUND4_STATUS.md). The bit==0 fallback branch is
        # semantically REDUNDANT: for a row with no valid samples every
        # tent weight vanishes (gx<=-1 / gx>=W give oxT=0 under the xs=0
        # dead-row start since W > SW; gy OOB gives wy=0; pad columns carry
        # the 1e9 sentinel), so the unified path yields acc=0 -> invalid
        # probe -> l1+bias, exactly the reference fallback. Keep only the
        # all-rows-dead skip per depth plane (4-21% of planes on real
        # geometry), and run live planes straight-line.
        @pl.when(rowmask == 0)
        def _():
            out_ref[0, d] = l1_tile + bias

        @pl.when(rowmask != 0)
        def _():
            for r in range(TH):
                curr_r = curr_rows[r]  # (C, TW) f32
                xc = xc_ref[0, d, r : r + 1, :]  # (1, TW) f32
                yc = yc_ref[0, d, r : r + 1, :]
                # per-row window starts come prefetched (in-kernel
                # vector->scalar min reductions cost ~30 ms/pair)
                y0r = jnp.clip(
                    y0r_base + ((y0d >> (4 * r)) & 0xF), 0, WH - NY
                )
                xs_row = ((xs16 >> (4 * r)) & 0xF) * 16
                xs_row = pl.multiple_of(xs_row, 16)
                # tent weights ARE the bilinear x-weights: 1-fx at
                # floor(x), fx at floor(x)+1, 0 elsewhere (incl. the 1e9
                # OOB sentinel)
                xrel = xc - xs_row.astype(jnp.float32)  # (1, TW)
                oxT = jnp.maximum(0.0, 1.0 - jnp.abs(iota_f - xrel))

                # ONE K = NY*SW contraction instead of NY small ones: the
                # per-(row, depth) MXU issue rate is the kernel's floor
                # (~25k grid steps x 8 rows x NY matmuls/pair), so fold
                # the bilinear y tent-weight of each window row into the
                # one-hot columns and stack the NY rows along K. Rounding
                # the PRODUCT wx*wy to win.dtype is one rounding, the same
                # error class as the old path's bf16 wx times f32 wy.
                # The NY window rows are CONTIGUOUS (y0r..y0r+NY-1), so the
                # operand build is one 3-D slice + a layout-free collapse
                # (SW % 8 sublanes) and one broadcast multiply — the r3
                # per-row slice+concat loop copied the same bytes twice and
                # issued 2*NY VMEM copy ops per matmul.
                A = win[pl.ds(y0r, NY), pl.ds(xs_row, SW), :].reshape(
                    NY * SW, win.shape[-1]
                )
                rows_abs = (y0 + y0r).astype(jnp.float32) + iota_ny
                wy = jnp.maximum(
                    0.0, 1.0 - jnp.abs(yc[None] - rows_abs)
                )  # (NY, 1, TW)
                O = (oxT[None] * wy).astype(win.dtype).reshape(NY * SW, TW)
                acc = jax.lax.dot_general(
                    A, O,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (C, TW)
                # invalid-warp probe channel: the reference checks channel
                # 0 of the LAST 4-channel group (= global C-4), not global
                # channel 0 (view_transformer.py:600-601)
                ci = max(acc.shape[0] - 4, 0)
                invalid = (acc[ci : ci + 1, :] == 0.0).astype(jnp.float32)
                cost = jnp.sum(
                    jnp.abs(curr_r - acc), axis=0, keepdims=True
                )
                out_ref[0, d, r : r + 1, :] = cost + invalid * bias

        return 0

    jax.lax.fori_loop(0, D, one_depth, 0)


def _pack_info(gx, gy, valid, D, n_th, n_tw, W, H, Wp, SW, WH):
    """Per-(bn, tile, d) prefetch words (3 int32 arrays):

      info:  rowmask(8) | new(1) | window y0(7) | y0r_base(6 @bit16)
      xs16:  8 rows x 4 bits — per-row x sub-window start / 16
      y0d:   8 rows x 4 bits — per-row y start delta vs y0r_base (clipped
             at 15; beyond-delta rows fall into the zeros+bias tail)

    Per-row starts are precomputed HERE because in-kernel vector->scalar
    min-reductions measured ~30 ms/pair of pure overhead. y segments are
    grown greedily over consecutive depth planes; `new` marks planes where
    the kernel must re-DMA the window band.
    """
    assert Wp - SW <= 15 * 16, (Wp, SW)  # xs16 packing range
    assert H - WH <= 127, (H, WH)  # seg_y0 packs into 7 bits of `info`
    BN = gx.shape[0]
    big = jnp.float32(1e6)
    xt = gx.reshape(BN, D, n_th, TH, n_tw, TW)
    yt = gy.reshape(BN, D, n_th, TH, n_tw, TW)
    vt = valid.reshape(BN, D, n_th, TH, n_tw, TW)

    xv = jnp.where(vt, xt, big)
    yv = jnp.where(vt, yt, big)
    yvmax = jnp.where(vt, yt, -big)

    rxmin = jnp.floor(xv.min(axis=5))              # (BN, D, n_th, TH, n_tw)
    rymin = jnp.floor(yv.min(axis=5))
    ymax = jnp.floor(yvmax.max(axis=(3, 5)))
    row_any = vt.any(axis=5)                        # (BN, D, n_th, TH, n_tw)
    return _pack_tail(rxmin, rymin, ymax, row_any, D, n_th, n_tw, H, Wp,
                      SW, WH)


def _pack_tail(rxmin, rymin, ymax, row_any, D, n_th, n_tw, H, Wp, SW, WH):
    """Shared packing tail from per-row warp statistics.

    rxmin/rymin: (BN, D, n_th, TH, n_tw) floored per-row mins over valid
    samples (big where the row has none); ymax: (BN, D, n_th, n_tw) floored
    tile max (-big); row_any: per-row any-valid."""
    BN = row_any.shape[0]
    ymin = rymin.min(axis=3)
    valid_d = row_any.any(axis=3)
    bits = (2 ** np.arange(TH)).astype(np.int32)
    rowmask = (row_any.astype(jnp.int32)
               * bits[None, None, None, :, None]).sum(axis=3)

    # per-row x sub-window start, 16-aligned (Mosaic needs provably
    # aligned dynamic sublane offsets; 16 keeps the packing to 4 bits)
    rxs = jnp.clip(rxmin.astype(jnp.int32) & ~15, 0, Wp - SW)
    rxs = jnp.where(row_any, rxs, 0)
    xs16 = ((rxs // 16) << (4 * np.arange(TH))[None, None, None, :, None]
            ).sum(axis=3).astype(jnp.int32)        # (BN, D, n_th, n_tw)

    lo_d = jnp.clip(ymin.astype(jnp.int32), 0, H)       # first needed row
    hi_d = jnp.clip(ymax.astype(jnp.int32) + 2, 0, H)   # past-last needed

    # per-row y start as base + 4-bit delta (tile y-spans are p99 <~13 px)
    ry = jnp.clip(rymin.astype(jnp.int32), 0, H)
    ydelta = jnp.clip(ry - lo_d[:, :, :, None, :], 0, 15)
    ydelta = jnp.where(row_any, ydelta, 0)
    y0d = (ydelta << (4 * np.arange(TH))[None, None, None, :, None]
           ).sum(axis=3).astype(jnp.int32)         # (BN, D, n_th, n_tw)

    T = BN * n_th * n_tw
    BIG = jnp.int32(10**6)

    def scan_fn(carry, inp):
        have, seg_y0, lo, hi = carry
        v, ld, hd, first = inp
        nlo = jnp.minimum(lo, ld)
        nhi = jnp.maximum(hi, hd)
        fits = have & (nlo >= seg_y0) & (nhi <= seg_y0 + WH)
        start = v & ~fits
        new = first | start
        seg_y0 = jnp.where(start, jnp.clip(ld, 0, H - WH), seg_y0)
        have = have | start
        lo = jnp.where(start, ld, jnp.where(v, nlo, lo))
        hi = jnp.where(start, hd, jnp.where(v, nhi, hi))
        return (have, seg_y0, lo, hi), (seg_y0, new.astype(jnp.int32))

    first = jnp.zeros((D,), bool).at[0].set(True)
    init = (
        jnp.zeros((T,), bool),
        jnp.zeros((T,), jnp.int32),
        jnp.full((T,), BIG),
        jnp.full((T,), -BIG),
    )
    perm = lambda a: a.transpose(1, 0, 2, 3).reshape(D, T)
    _, (seg_y0, new) = jax.lax.scan(
        scan_fn, init,
        (perm(valid_d), perm(lo_d), perm(hi_d),
         jnp.broadcast_to(first[:, None], (D, T))),
    )
    # -> (BN, n_th, n_tw, D) step order
    unperm = lambda a: a.reshape(D, BN, n_th, n_tw).transpose(1, 2, 3, 0)
    tostep = lambda a: a.transpose(0, 2, 3, 1)
    seg_y0_s = unperm(seg_y0)
    # first needed row relative to the DMA'd window origin (the scan
    # guarantees lo_d >= seg_y0 whenever the plane has valid samples)
    base_rel = jnp.clip(tostep(lo_d) - seg_y0_s, 0, 63)
    info = (
        tostep(rowmask)
        | (unperm(new) << 8)
        | (seg_y0_s << 9)
        | (base_rel << 16)
    )
    return info.reshape(-1), tostep(xs16).reshape(-1), tostep(y0d).reshape(-1)


def plane_sweep_supported(feat_shape) -> bool:
    """True iff the fused kernel's layout assumptions hold for (BN,H,W,C)
    stereo features: H divisible by the 8-row output tile, and C a
    multiple of 128 lanes — the y-band window DMA slices the source on a
    C-minor layout, and TPU DMA slices must be lane-aligned on the minor
    dim (flagship: H=128, C=128). Callers fall back to the gather-table
    path otherwise (tiny test configs, odd-channel backbones).

    H is additionally capped at 175: the per-tile-depth-segment window
    start seg_y0 in [0, H - WH] is packed into 7 bits of the prefetched
    info word (`_pack_info`), so H - WH (WH = min(48, H)) must be <= 127
    or the start would silently wrap and warp the wrong y-band.

    W is capped so the per-row x sub-window start fits its 4-bit/16-px
    packing (`_pack_info`'s xs16: Wp - SW <= 240 with SW = min(224, Wp)
    and Wp the 128-padded width floored at 256) — i.e. padded widths up
    to 464 px (flagship cv width 352)."""
    _, H, W, C = feat_shape
    wh = min(48, H)
    wp = max(-(-W // TW) * TW, 256)
    return (
        H % TH == 0 and C % 128 == 0 and H - wh <= 127
        and wp - min(224, wp) <= 15 * 16
    )


@functools.partial(jax.jit, static_argnames=("bias", "interpret"))
def plane_sweep_cost(
    prev_feat: jnp.ndarray,
    curr_feat: jnp.ndarray,
    grid: jnp.ndarray,
    bias: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused counterpart of `stereo_cost_volume` (pre-softmax cost).

    Args:
      prev_feat, curr_feat: (BN, H, W, C) stereo features.
      grid: (BN, D*H, W, 2) normalized sampling coords (gen_stereo_grid).
      bias: added where the warp lands outside the previous image.
    Returns:
      (BN, D, H, W) float32 cost (caller applies softmax(-cost) over D).
    """
    BN, H, W, C = prev_feat.shape
    D = grid.shape[1] // H
    assert H % TH == 0, (H, TH)
    Wp = max(-(-W // TW) * TW, 256)
    # per-ROW sub-window: row x-footprint is ~TW + warp slack (p99 < 195 px
    # even at 7 m/frame ego motion); rows beyond it hit the zeros+bias
    # fallback tail
    SW = min(224, Wp)
    WH = min(48, H)
    n_th, n_tw = H // TH, Wp // TW

    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    gx = gx.reshape(BN, D, H, W).astype(jnp.float32)
    gy = gy.reshape(BN, D, H, W).astype(jnp.float32)
    valid = (gx > -1.0) & (gx < W) & (gy > -1.0) & (gy < H)
    pad_w = Wp - W
    if pad_w:
        pads = ((0, 0),) * 3 + ((0, pad_w),)
        gx = jnp.pad(gx, pads, constant_values=1e9)
        gy = jnp.pad(gy, pads, constant_values=1e9)
        valid = jnp.pad(valid, pads)

    info, xs16, y0d = _pack_info(gx, gy, valid, D, n_th, n_tw, W, H, Wp, SW, WH)

    prev_p = jnp.pad(prev_feat, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
    curr_t = jnp.transpose(curr_feat, (0, 1, 3, 2))  # (BN, H, C, W)
    curr_t = jnp.pad(curr_t, ((0, 0), (0, 0), (0, 0), (0, pad_w)))

    kernel = functools.partial(
        _cv_kernel, D=D, n_th=n_th, n_tw=n_tw, W=W, H=H, Wp=Wp,
        SW=SW, WH=WH, bias=float(bias),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(BN, n_th, n_tw),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, D, TH, TW),
                    lambda bn, th, tw, *_: (bn, 0, th, tw),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, D, TH, TW),
                    lambda bn, th, tw, *_: (bn, 0, th, tw),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TH, C, TW),
                    lambda bn, th, tw, *_: (bn, th, 0, tw),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, D, TH, TW),
                lambda bn, th, tw, *_: (bn, 0, th, tw),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((WH, Wp, C), prev_feat.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((BN, D, H, Wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(info, xs16, y0d, prev_p, gx, gy, curr_t)
    return out[..., :W]


# ---------------------------------------------------------------------------
# Homography variant (r5): the warp of a fixed depth plane is a 3x3
# homography in the output pixel index (models/depthnet.py::
# gen_stereo_homography), so the kernel evaluates coordinates IN-REGISTER
# from 9 scalars per (camera, depth) instead of streaming (BN, D, H, Wp)
# gx/gy arrays from HBM — and the prefetch packing's full-array reductions
# collapse to row-endpoint algebra on (BN, D, H, n_tw, 2) scalars (gx/gy
# are monotonic along a row wherever z > 0, so valid-sample mins/maxes are
# clipped endpoint evaluations). This removed ~8 GB/pair of XLA-side
# coordinate-chain traffic that dominated the in-model cost-volume stage.
# ---------------------------------------------------------------------------


def _pack_info_hom(hom, D, n_th, n_tw, W, H, Wp, SW, WH):
    """Prefetch words from homographies (see _pack_info for the layout).

    Per (bn, d, row, tile): the z-valid c-interval comes from the affine
    denominator's root; gx/gy evaluated at its (clipped) endpoints bound
    the valid-sample mins exactly in the interior and conservatively
    (never tighter than truth) at image-edge crossings — a too-early
    window start or too-wide y segment only adds covered rows, never
    drops live ones; rows it marks live with no contributing sample fall
    through the kernel's unified math to the exact zeros+bias fallback.
    """
    assert Wp - SW <= 15 * 16, (Wp, SW)
    assert H - WH <= 127, (H, WH)
    BN = hom.shape[0]
    eps = 1e-3
    big = jnp.float32(1e6)

    # broadcast frame: (BN, D, H, n_tw); all arrays below live in it
    def hc(i):  # homography coefficient i
        return hom.reshape(BN, D, 9)[:, :, i][:, :, None, None]

    v = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    # per-tile c endpoints (the real-width last pixel, excluding lane pad)
    c0_np = (np.arange(n_tw) * TW).astype(np.float32)
    c1_np = np.minimum(c0_np + TW, W) - 1.0
    c0b = jnp.asarray(c0_np)[None, None, None, :]
    c1b = jnp.asarray(c1_np)[None, None, None, :]

    # z at endpoints; z-valid sub-interval via the affine root
    zvc = hc(7) * v + hc(8)  # z(c) = h6*c + zvc
    zl = hc(6) * c0b + zvc
    zr = hc(6) * c1b + zvc
    croot = (eps - zvc) / jnp.where(
        jnp.abs(hc(6)) < 1e-20, 1e-20, hc(6)
    )
    cl = jnp.where(zl >= eps, c0b, jnp.maximum(c0b, croot))
    ch = jnp.where(zr >= eps, c1b, jnp.minimum(c1b, croot))
    empty = (zl < eps) & (zr < eps)

    def gxy(c):
        den = jnp.maximum(hc(6) * c + zvc, eps)  # endpoints are z-valid
        inv = 1.0 / den
        gx = (hc(0) * c + hc(1) * v + hc(2)) * inv
        gy = (hc(3) * c + hc(4) * v + hc(5)) * inv
        return gx, gy

    gx_l, gy_l = gxy(cl)
    gx_r, gy_r = gxy(ch)
    gxl = jnp.minimum(gx_l, gx_r)
    gxh = jnp.maximum(gx_l, gx_r)
    gyl = jnp.minimum(gy_l, gy_r)
    gyh = jnp.maximum(gy_l, gy_r)
    row_any = (
        (~empty) & (cl <= ch)
        & (gxh > -1.0) & (gxl < W) & (gyh > -1.0) & (gyl < H)
    )  # (BN, D, H, n_tw)
    rxmin = jnp.where(row_any, jnp.floor(jnp.maximum(gxl, -1.0)), big)
    rymin = jnp.where(row_any, jnp.floor(jnp.maximum(gyl, -1.0)), big)
    rymax = jnp.where(row_any, jnp.floor(jnp.minimum(gyh, H)), -big)

    tile = lambda a: a.reshape(BN, D, n_th, TH, n_tw)
    ymax = tile(rymax).max(axis=3)
    return _pack_tail(tile(rxmin), tile(rymin), ymax, tile(row_any),
                      D, n_th, n_tw, H, Wp, SW, WH)


def _cv_kernel_hom(
    info_ref, xs16_ref, y0d_ref, hom_ref,
    prev_hbm, curr_ref, out_ref, win, sem, *,
    D, n_th, n_tw, W, H, Wp, SW, WH, bias,
):
    bn = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    base = ((bn * n_th + th) * n_tw + tw) * D

    iota_f = jax.lax.broadcasted_iota(jnp.int32, (SW, TW), 0).astype(
        jnp.float32
    )
    iota_ny = jax.lax.broadcasted_iota(jnp.int32, (NY, 1, 1), 0).astype(
        jnp.float32
    )
    col = (tw * TW
           + jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1))  # (1, TW)
    colf = col.astype(jnp.float32)
    pad_bad = col >= W  # lane-pad columns (grid path: 1e9-padded coords)
    curr_rows = [curr_ref[0, r].astype(jnp.float32) for r in range(TH)]
    l1_rows = [
        jnp.sum(jnp.abs(c), axis=0, keepdims=True) for c in curr_rows
    ]
    l1_tile = jnp.concatenate(l1_rows, axis=0)  # (TH, TW)

    def one_depth(d, _):
        info = info_ref[base + d]
        xs16 = xs16_ref[base + d]
        y0d = y0d_ref[base + d]
        rowmask = info & 0xFF
        new = (info >> 8) & 1
        y0 = (info >> 9) & 0x7F
        y0r_base = (info >> 16) & 0x3F
        hb = (bn * D + d) * 9
        h00 = hom_ref[hb + 0]
        h01 = hom_ref[hb + 1]
        h02 = hom_ref[hb + 2]
        h10 = hom_ref[hb + 3]
        h11 = hom_ref[hb + 4]
        h12 = hom_ref[hb + 5]
        h20 = hom_ref[hb + 6]
        h21 = hom_ref[hb + 7]
        h22 = hom_ref[hb + 8]

        @pl.when(new == 1)
        def _():
            cp = pltpu.make_async_copy(
                prev_hbm.at[bn, pl.ds(y0, WH)], win, sem
            )
            cp.start()
            cp.wait()

        @pl.when(rowmask == 0)
        def _():
            out_ref[0, d] = l1_tile + bias

        @pl.when(rowmask != 0)
        def _():
            for r in range(TH):
                curr_r = curr_rows[r]  # (C, TW) f32
                vr = jnp.float32(1.0) * (th * TH + r)
                den = h20 * colf + (h21 * vr + h22)
                bad = (den < 1e-3) | pad_bad
                inv = 1.0 / jnp.where(bad, 1.0, den)
                xc = jnp.where(bad, 1e9, (h00 * colf + h01 * vr + h02) * inv)
                yc = jnp.where(bad, 1e9, (h10 * colf + h11 * vr + h12) * inv)
                y0r = jnp.clip(
                    y0r_base + ((y0d >> (4 * r)) & 0xF), 0, WH - NY
                )
                xs_row = ((xs16 >> (4 * r)) & 0xF) * 16
                xs_row = pl.multiple_of(xs_row, 16)
                xrel = xc - xs_row.astype(jnp.float32)  # (1, TW)
                oxT = jnp.maximum(0.0, 1.0 - jnp.abs(iota_f - xrel))
                A = win[pl.ds(y0r, NY), pl.ds(xs_row, SW), :].reshape(
                    NY * SW, win.shape[-1]
                )
                rows_abs = (y0 + y0r).astype(jnp.float32) + iota_ny
                wy = jnp.maximum(
                    0.0, 1.0 - jnp.abs(yc[None] - rows_abs)
                )  # (NY, 1, TW)
                O = (oxT[None] * wy).astype(win.dtype).reshape(NY * SW, TW)
                acc = jax.lax.dot_general(
                    A, O,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (C, TW)
                ci = max(acc.shape[0] - 4, 0)
                invalid = (acc[ci : ci + 1, :] == 0.0).astype(jnp.float32)
                cost = jnp.sum(
                    jnp.abs(curr_r - acc), axis=0, keepdims=True
                )
                out_ref[0, d, r : r + 1, :] = cost + invalid * bias

        return 0

    jax.lax.fori_loop(0, D, one_depth, 0)


@functools.partial(jax.jit, static_argnames=("bias", "interpret"))
def plane_sweep_cost_hom(
    prev_feat: jnp.ndarray,
    curr_feat: jnp.ndarray,
    hom: jnp.ndarray,
    bias: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """`plane_sweep_cost` with coordinates from per-plane homographies.

    Args:
      prev_feat, curr_feat: (BN, H, W, C) stereo features.
      hom: (BN, D, 3, 3) from `gen_stereo_homography` (output feature-pixel
        indices -> previous feature-pixel homogeneous coords).
      bias: added where the warp sampled nothing.
    Returns:
      (BN, D, H, W) float32 cost (caller applies softmax(-cost) over D).
    """
    BN, H, W, C = prev_feat.shape
    D = hom.shape[1]
    assert H % TH == 0, (H, TH)
    Wp = max(-(-W // TW) * TW, 256)
    SW = min(224, Wp)
    WH = min(48, H)
    n_th, n_tw = H // TH, Wp // TW

    hom = hom.astype(jnp.float32)
    info, xs16, y0d = _pack_info_hom(hom, D, n_th, n_tw, W, H, Wp, SW, WH)

    pad_w = Wp - W
    prev_p = jnp.pad(prev_feat, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
    curr_t = jnp.transpose(curr_feat, (0, 1, 3, 2))  # (BN, H, C, W)
    curr_t = jnp.pad(curr_t, ((0, 0), (0, 0), (0, 0), (0, pad_w)))

    kernel = functools.partial(
        _cv_kernel_hom, D=D, n_th=n_th, n_tw=n_tw, W=W, H=H, Wp=Wp,
        SW=SW, WH=WH, bias=float(bias),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(BN, n_th, n_tw),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, TH, C, TW),
                    lambda bn, th, tw, *_: (bn, th, 0, tw),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, D, TH, TW),
                lambda bn, th, tw, *_: (bn, 0, th, tw),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((WH, Wp, C), prev_feat.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((BN, D, H, Wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(info, xs16, y0d, hom.reshape(-1), prev_p, curr_t)
    return out[..., :W]
