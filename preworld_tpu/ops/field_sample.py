"""Corner-expanded trilinear field sampling (the NeRF render hot path).

TPU gathers are DESCRIPTOR-rate-bound: the render's trilinear sampling
(reference `nerf_head.py:209-225`, torch `F.grid_sample`) would cost 8 row
gathers per (ray, sample) — ~128M descriptors per pretrain forward at
38,400 rays x 417 samples, the dominant term of the round-1 16.9 s train
step. Corner expansion packs a sample's whole interpolation footprint into
contiguous table rows so a sample costs 1-2 descriptors, and every fetched
byte is used.

Two table layouts, chosen per direction (all rates measured on one v5e):

* FORWARD — `build_parity_tables` / `sample_parity_tables`: two z-parity
  tables of 4-xy-corner rows. Each is ~93 MB bf16 at flagship scale, which
  keeps it under the ~128 MB VMEM cliff where TPU gathers run ~3.5x faster
  (~257 vs ~71 M descriptors/s); rows are exactly one 128-lane tile.
  2 descriptors/sample.
* BACKWARD — `_corner8_scatter_grad`: one scatter in the single-table
  8-corner layout (scatter rate is size-INsensitive, so one 16M-descriptor
  scatter beats two parity-layout ones), then a dense 8-shifted-view fold
  back to the field.

`sample_field_fused` / `sample_tables_fused` bind the two directions with a
custom VJP whose only residual is the sample coordinates — the backward
never re-gathers. The legacy single 8-corner table (`build_corner_table` /
`sample_corner_table`) remains as the readable oracle.

Semantics match `grid_sample_3d(..., align_corners=True, zeros padding)` on
an (X, Y, Z, C) field with normalized xyz coords — oracled in
tests/test_ops.py against the general implementation.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
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
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    xs = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    ys = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    rows = table[ys * (W + 1) + xs]  # (P, 4C)
    # flat 2D slice-multiply-add combine, f32 accumulation: a (P, 4, C)
    # reshape + einsum would force a sublane-padded 3D relayout on TPU
    # (~8x the bytes), and plain-bf16 accumulation would round differently
    # from the excess-precision elementwise grid_sample path
    w4 = ((1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx)
    out = rows[:, :C].astype(jnp.float32) * w4[0][:, None]
    for k in (1, 2, 3):
        out = out + (
            rows[:, k * C : (k + 1) * C].astype(jnp.float32) * w4[k][:, None]
        )
    valid = (x0 + 1 >= 0) & (x0 <= W - 1) & (y0 + 1 >= 0) & (y0 <= H - 1)
    return (out * valid[:, None].astype(jnp.float32)).astype(table.dtype)


def _unnorm(p, n):
    """align_corners=True mapping from [-1, 1] to [0, n-1] grid coords."""
    return (p + 1.0) * 0.5 * (n - 1)


def _floor_in_bounds(f0, n):
    """Zero-padding validity of a FLOORED grid coord along one axis.

    Single source of truth for "does this sample touch the real field at
    all" — used by `_trilinear_coords` (the sampler's valid mask) and by the
    backward live-sample mask in `_corner8_scatter_grad`. The two MUST agree:
    if the live mask dropped a point the sampler treats as valid, the compact
    backward would silently lose its gradient with no fallback triggering.
    """
    return (f0 + 1 >= 0) & (f0 <= n - 1)


def _trilinear_coords(dims_xyz, pts_norm, dtype):
    """Shared index/weight math for the corner-table samplers.

    Returns (xs, ys, zs) int32 indices into the +1-shifted padded base grid,
    (fx, fy, fz) fractional weights, and the in-range validity mask.
    """
    X, Y, Z = dims_xyz
    p = pts_norm.reshape(-1, 3)
    x = _unnorm(p[:, 0], X)
    y = _unnorm(p[:, 1], Y)
    z = _unnorm(p[:, 2], Z)
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx = (x - x0).astype(dtype)
    fy = (y - y0).astype(dtype)
    fz = (z - z0).astype(dtype)
    xs = jnp.clip(x0 + 1, 0, X).astype(jnp.int32)
    ys = jnp.clip(y0 + 1, 0, Y).astype(jnp.int32)
    zs = jnp.clip(z0 + 1, 0, Z).astype(jnp.int32)
    valid = (
        _floor_in_bounds(x0, X)
        & _floor_in_bounds(y0, Y)
        & _floor_in_bounds(z0, Z)
    )
    return xs, ys, zs, fx, fy, fz, valid


def _corner_slot(C: int) -> int:
    """Lane width of one corner block inside a parity-table row.

    Padding each corner's C channels to a 32-lane slot keeps every
    corner-block slice lane-aligned and (for C<=32) makes rows exactly one
    128-lane tile — both the fastest gather row shape and a layout the
    downstream slice-multiply-add consumes without any 3D relayout.

    For C > 32 the slot INTENTIONALLY rounds up to whole 128-lane tiles
    (not the next 32-lane multiple): the measured gather fast path wants
    rows that are an integral number of 128-lane tiles, and a 32-lane
    sub-tile slot would put corner boundaries mid-tile. The memory cost
    (e.g. C=40 -> 128-lane slots, 3.2x) is accepted; today only C=21 and
    C<=32 fields use this path, so keep an eye on table size vs the
    ~128 MB VMEM-staging cliff if a wider field ever lands here.
    """
    return max(32, -(-C // 128) * 128) if C > 32 else 32


def build_parity_tables(field: jnp.ndarray, table_dtype=None):
    """(X, Y, Z, C) field -> two z-parity xy-corner tables.

    Each row of T_even / T_odd holds the FOUR xy-interpolation corners
    (dx*2 + dy order, one `_corner_slot(C)`-lane block each) of base cell
    (i, j) at one padded z-plane of even / odd index. Together one even row
    + one odd row cover all 8 trilinear corners of a sample (its two
    z-planes have opposite parity), so a trilinear sample costs TWO gather
    descriptors.

    Why this beats the single 8-corner table on TPU (v5e, measured): a
    gather runs ~3.5x faster when its (lane-padded) operand fits VMEM
    (~257 vs ~71 M desc/s). The 8-corner table at flagship scale is 352 MB
    bf16 padded (HBM regime); each parity table is 93 MB (VMEM regime) with
    exactly one 128-lane tile per row — the fastest row shape.
    `table_dtype` (default: the field dtype) exists because f32 parity
    tables (186 MB) would fall back off the VMEM cliff — the flagship
    passes bfloat16 (weights/compositing stay f32).
    """
    if table_dtype is not None:
        field = field.astype(table_dtype)
    C = field.shape[-1]
    slot = _corner_slot(C)
    padded = jnp.pad(field, ((1, 1), (1, 1), (1, 1), (0, slot - C)))
    Xp, Yp, Zp, _ = padded.shape
    corners = [
        padded[dx : dx + Xp - 1, dy : dy + Yp - 1]
        for dx in (0, 1)
        for dy in (0, 1)
    ]
    a = jnp.concatenate(corners, axis=-1)  # (X+1, Y+1, Z+2, 4*slot)
    t_even = a[:, :, 0::2]
    t_odd = a[:, :, 1::2]
    return (
        t_even.reshape(-1, t_even.shape[-1]),
        t_odd.reshape(-1, t_odd.shape[-1]),
    )


def sample_parity_tables(
    table_e: jnp.ndarray,
    table_o: jnp.ndarray,
    dims_xyz: Tuple[int, int, int],
    pts_norm: jnp.ndarray,
    channels: int,
    out_dtype=None,
    seg_target: int = 1 << 21,
) -> jnp.ndarray:
    """Trilinear-sample via the z-parity tables (see build_parity_tables).

    Semantics identical to `sample_corner_table` (align_corners=True, zeros
    padding); compositing-side math in `out_dtype` (default f32). Two
    layout rules keep this at gather speed-of-light (both measured ~2x on
    v5e): large point sets run as a lax.map over ~`seg_target`-point
    segments (XLA compile time on one fused 16M-point gather is tens of
    minutes; a 2M-point body compiles once and still saturates the gather
    unit), and the 4-corner combine is FLAT 2D slice-multiply-adds on the
    (P, 4*slot) gathered rows — an einsum over a (P, 4, C) reshape would
    force a sublane/lane-padded 3D layout that materializes ~8x the bytes.
    """
    X, Y, Z = dims_xyz
    C = channels
    slot = table_e.shape[-1] // 4
    out_dtype = out_dtype or jnp.float32
    spatial = pts_norm.shape[:-1]
    n_even = (Z + 3) // 2  # ceil((Z+2)/2) padded planes of even index
    n_odd = (Z + 2) // 2

    def seg_sample(pts_s):
        xs, ys, zs, fx, fy, fz, valid = _trilinear_coords(
            dims_xyz, pts_s, out_dtype
        )
        k_e = (zs + 1) // 2
        k_o = zs // 2
        xy = xs * (Y + 1) + ys
        rows_e = table_e[xy * n_even + k_e]  # (n, 4*slot)
        rows_o = table_o[xy * n_odd + k_o]
        wx0, wy0 = 1 - fx, 1 - fy
        w4 = (wx0 * wy0, wx0 * fy, fx * wy0, fx * fy)

        def combine(rows):
            acc = rows[:, :slot].astype(out_dtype) * w4[0][:, None]
            for k in (1, 2, 3):
                acc = acc + (
                    rows[:, k * slot : (k + 1) * slot].astype(out_dtype)
                    * w4[k][:, None]
                )
            return acc

        zs_even = (zs % 2) == 0
        w_ze = jnp.where(zs_even, 1 - fz, fz)[:, None]
        w_zo = jnp.where(zs_even, fz, 1 - fz)[:, None]
        out = combine(rows_e) * w_ze + combine(rows_o) * w_zo
        return (out * valid[:, None].astype(out_dtype))[:, :C]

    pts = pts_norm.reshape(-1, 3)
    P = pts.shape[0]
    n_seg = max(1, -(-P // seg_target))
    if n_seg == 1:
        return seg_sample(pts).reshape(*spatial, C)
    pad = (-P) % n_seg
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=-10.0)
    out = jax.lax.map(seg_sample, pts.reshape(n_seg, -1, 3))
    return out.reshape(-1, C)[:P].reshape(*spatial, C)


def _use_sorted_scatter() -> bool:
    """Route the corner8 backward through the sorted MXU segment-sum
    (scatter_sorted) instead of `.at[].add`. Default OFF: measured r5, at
    the live-cap-compacted flagship size (~4.5M rows) the variadic sort
    (~39 ms at 6 payload arrays; a 25-payload or 16M-row variant is a
    multi-10-minute COMPILE bomb through the relay) plus the chunk-walk
    kernel roughly re-buys the descriptor scatter it replaces — the sorted
    path only wins for LARGE uncompacted scatters, which the two-tier
    compaction already avoids. Kept oracled + opt-in via
    PREWORLD_SORTED_SCATTER=1 for future hardware where the trade flips."""
    import os

    return os.environ.get("PREWORLD_SORTED_SCATTER") == "1"


def _corner8_scatter_grad(field_shape, dims_xyz, pts_norm, g,
                          seg_target: int = 1 << 21,
                          live_cap: int = 0):
    """d(field) for trilinear sampling: one scatter in the 8-corner-table
    layout, then the dense fold back to the field (the exact transpose of
    `build_corner_table`). Used as the custom VJP of `sample_field_fused` —
    a single 16M-descriptor scatter beats two parity-layout scatters
    (scatter rate is table-size-insensitive on TPU, unlike gather), and the
    fold runs ONCE per render rather than once per ray chunk.

    The (P, 8C) f32 scatter updates would be ~10 GB at flagship scale, so
    the scatter runs as a lax.scan over ~`seg_target`-point segments with
    the table as carry (descriptor count unchanged; peak temp ~2 GB). The
    per-corner update blocks are built as a flat 2D lane-concat (corner
    slots padded to 32 lanes) for the same no-3D-relayout reason as the
    forward's combine.

    `live_cap` > 0 (requires (R, S, ...) inputs) turns on EXACT two-tier
    per-ray live-sample compaction: the render's early-exit / threshold
    `where`s give dead samples exactly-zero cotangents (see ops/render.py
    alpha2weight and models/nerf_head.py), and typically only ~4% of the
    R*S samples are live once OOB rows are masked, so the scatter —
    descriptor-rate-bound on TPU — shrinks ~S/cap-fold. Tier 1 scatters a
    contiguous `live_cap`-sample window covering each ray's live span
    (sort-free — see the in-code comment); rays whose span exceeds the cap
    (grazing rays) are zeroed in tier 1 and scattered WHOLE in a k_over-ray
    tier 2 pass, so the result is exact; only >k_over overflowing rays
    trips the lax.cond full-scatter fallback (every branch is exact — the
    caps only decide which exact path runs).
    """
    X, Y, Z = dims_xyz
    C = field_shape[-1]
    slot = _corner_slot(C)
    dt = g.dtype
    NV = (X + 1) * (Y + 1) * (Z + 1)

    def scatter_sorted(g_flat, pts_flat):
        """Sorted MXU segment-sum replacement for the `.at[].add` scatter
        (r5): scatter descriptors run ~45-55 M/s on TPU while the bev_pool
        chunk-walk kernel sums sorted rows at ~180 M/s and XLA's variadic
        sort moves (idx + the narrow fx/fy/fz/g-channel payloads) in
        ~3 ms/1.5M points — sorting the NARROW ingredients and building the
        (P, 8*slot) update rows post-sort avoids the one slow step, a
        wide-row gather from a >VMEM table. Accumulation rides the MXU
        one-hot contraction (f32 via bf16x6) instead of serial exact f32
        adds; oracled against the scatter path in tests/test_ops.py."""
        from .bev_pool_pallas import bev_pool_pallas_sorted

        xs, ys, zs, fx, fy, fz, valid = _trilinear_coords(
            dims_xyz, pts_flat, dt
        )
        idx = (xs * (Y + 1) + ys) * (Z + 1) + zs
        # park invalid rows past the live range (their updates are zeroed
        # below regardless; rows >= NV are sliced away)
        idx = jnp.where(valid, idx, NV + 1)
        gv = g_flat * valid[:, None].astype(dt)
        sorted_ = jax.lax.sort(
            (idx, fx, fy, fz, *(gv[:, c] for c in range(C))), num_keys=1
        )
        idx_s, fx, fy, fz = sorted_[:4]
        g_s = jnp.stack(sorted_[4:], axis=1)
        g_pad = jnp.pad(g_s, ((0, 0), (0, slot - C)))
        wx = (1 - fx, fx)
        wy = (1 - fy, fy)
        wz = (1 - fz, fz)
        upd = jnp.concatenate(
            [
                g_pad * (wx[dx] * wy[dy] * wz[dz])[:, None]
                for dx in (0, 1)
                for dy in (0, 1)
                for dz in (0, 1)
            ],
            axis=1,
        )  # (P, 8*slot)
        return bev_pool_pallas_sorted(upd, idx_s, NV)[:NV]

    def scatter_to_tab(g_flat, pts_flat, tab=None):
        P = g_flat.shape[0]

        def seg_scatter(tab, args):
            g_s, pts_s = args
            xs, ys, zs, fx, fy, fz, valid = _trilinear_coords(
                dims_xyz, pts_s, dt
            )
            g_pad = (
                jnp.pad(g_s, ((0, 0), (0, slot - C)))
                * valid[:, None].astype(dt)
            )
            wx = (1 - fx, fx)
            wy = (1 - fy, fy)
            wz = (1 - fz, fz)
            upd = jnp.concatenate(
                [
                    g_pad * (wx[dx] * wy[dy] * wz[dz])[:, None]
                    for dx in (0, 1)
                    for dy in (0, 1)
                    for dz in (0, 1)
                ],
                axis=1,
            )  # (n, 8*slot)
            idx = (xs * (Y + 1) + ys) * (Z + 1) + zs
            return tab.at[idx].add(upd), None

        n_seg = max(1, -(-P // seg_target))
        pad = (-P) % n_seg
        if pad:
            g_flat = jnp.pad(g_flat, ((0, pad), (0, 0)))
            # padded points land fully out of range -> valid=0 -> no update
            pts_flat = jnp.pad(
                pts_flat, ((0, pad), (0, 0)), constant_values=-10.0
            )
        if tab is None:
            tab = jnp.zeros(((X + 1) * (Y + 1) * (Z + 1), 8 * slot), dt)
        if n_seg == 1:
            tab, _ = seg_scatter(tab, (g_flat, pts_flat))
        else:
            tab, _ = jax.lax.scan(
                seg_scatter,
                tab,
                (
                    g_flat.reshape(n_seg, -1, C),
                    pts_flat.reshape(n_seg, -1, 3),
                ),
            )
        return tab

    use_compact = (
        live_cap > 0
        and pts_norm.ndim >= 3
        and pts_norm.shape[-2] > live_cap
    )
    if use_compact:
        R = 1
        for d in pts_norm.shape[:-2]:
            R *= d
        S = pts_norm.shape[-2]
        g2 = g.reshape(R, S, C)
        pts2 = pts_norm.reshape(R, S, 3)
        # a sample is live only if it has a nonzero cotangent AND lands in
        # range: out-of-bounds points are zeroed by `valid` inside
        # seg_scatter, so dropping them here is exact. This matters because
        # OOB samples read the zero sentinel -> alpha == alpha_init (1e-6)
        # > fast_color_thres (1e-7) -> they stay "live" by cotangent for
        # the whole march; a single ray exiting the voxel slab would
        # otherwise blow the cap and force the full-scatter fallback
        # (measured: trained-regime cotangents are 24% dense by g != 0
        # alone, but only ~4% dense once OOB rows are masked).
        def _in_range(p, n):
            return _floor_in_bounds(jnp.floor(_unnorm(p, n)), n)
        inb = (
            _in_range(pts2[..., 0], X)
            & _in_range(pts2[..., 1], Y)
            & _in_range(pts2[..., 2], Z)
        )
        live = jnp.any(g2 != 0, axis=-1) & inb  # (R, S)
        # two-tier exact compaction (r4; VERDICT r3 next #3): the all-or-
        # nothing cap never engaged at flagship scale because a handful of
        # GRAZING rays (in-bounds by the one-cell tolerance but reading
        # mostly zero padding) stay cotangent-live for 100-200+ samples
        # (max 210 vs cap 128 measured in the opaque regime). Tier 1
        # scatters a CONTIGUOUS `live_cap`-sample window covering every
        # non-overflow ray's live SPAN — samples are z-ordered along the
        # ray, so the live set sits in one [first, last] interval and any
        # dead samples inside the window scatter exact zeros. A windowed
        # slice needs no 16M-element argsort (the argsort cost ate most of
        # the compaction win: measured 825 vs 914 ms full-grad with it,
        # and the sort alone is ~45 bitonic passes over (R, S) int32).
        # Tier 2 scatters `k_over` WHOLE rays for the overflow rays
        # (span > cap), which tier 1 zeroed. Every live sample lands in
        # exactly one tier, so the result is exact; the lax.cond full-
        # scatter fallback now fires only when >k_over rays overflow.
        # k_over = R/8: measured on a realistic mostly-empty scene with
        # opaque walls, ~12% of live rays (3.6k of 38.4k total) exceed a
        # 64-sample span (wall-grazing transmittance chains) — an R/64
        # budget made the fallback fire ALWAYS, silently disabling the
        # compaction. Tier 2 stays descriptor-cheap (k_over*S ~= 2M vs
        # the full path's 16M).
        k_over = max(64, R // 8)
        first = jnp.argmax(live, axis=1).astype(jnp.int32)  # (R,)
        last = (S - 1) - jnp.argmax(live[:, ::-1], axis=1).astype(jnp.int32)
        has = jnp.any(live, axis=1)
        over = has & (last - first >= live_cap)  # span doesn't fit the cap
        fits = over.sum() <= k_over

        def compact_branch():
            # window start, clamped so the slice stays in-bounds; rays with
            # no live samples scatter all-zero updates regardless (dead
            # cotangents are exactly 0; OOB updates are valid-zeroed)
            start = jnp.where(
                ~over, jnp.minimum(first, S - live_cap), 0
            )
            offs = start[:, None] + jnp.arange(live_cap, dtype=jnp.int32)
            flat = (
                jnp.arange(R, dtype=jnp.int32)[:, None] * S + offs
            ).reshape(-1)
            # SEPARATE row gathers for pts and g (still descriptor-bound;
            # a fused pts+g gather would first materialize a concatenated
            # (R*S, 3+C) f32 copy — ~1.5 GB at flagship scale, which ate
            # the entire compaction win). Overflow rays' updates are zeroed
            # on the small GATHERED array and handled whole in tier 2.
            pts_rows = pts2.reshape(R * S, 3)[flat]
            g_rows = g2.reshape(R * S, C)[flat]
            keep_row = jnp.repeat(~over, live_cap).astype(dt)[:, None]
            g1 = g_rows * keep_row
            # tier 2: whole-ray scatter of the overflow rays. argsort puts
            # overflow rays first; non-overflow padding rows are zeroed by
            # `omask` (k_over*S extra descriptors — ~1-2% of the full
            # scatter at flagship scale)
            ridx = jnp.argsort(
                jnp.where(over, 0, 1).astype(jnp.int32), stable=True
            )[:k_over]
            omask = over[ridx].astype(dt)  # (k_over,)
            g_o = (g2[ridx] * omask[:, None, None]).reshape(-1, C)
            pts_o = pts2[ridx].reshape(-1, 3)
            if _use_sorted_scatter():
                return scatter_sorted(
                    jnp.concatenate([g1, g_o], axis=0),
                    jnp.concatenate([pts_rows, pts_o], axis=0),
                )
            tab = scatter_to_tab(g1, pts_rows)
            return scatter_to_tab(g_o, pts_o, tab=tab)

        # the full-P fallback stays on the segmented `.at[].add` scatter:
        # a 16M-point variadic sort measured as a COMPILE bomb through the
        # relay (tens of minutes), and the fallback is the rare branch
        tab = jax.lax.cond(
            fits,
            compact_branch,
            lambda: scatter_to_tab(g.reshape(-1, C), pts_norm.reshape(-1, 3)),
        )
    else:
        tab = scatter_to_tab(g.reshape(-1, C), pts_norm.reshape(-1, 3))
    # dense fold back to the field as ONE conv instead of 8 sequential
    # shifted .at[].add passes (each of those read + wrote the full padded
    # field — ~1 GB of extra traffic at flagship scale, a fixed cost that
    # swamped the compaction's descriptor savings):
    #   d_field[x, y, z] = sum_corners tab[x+1-dx, y+1-dy, z+1-dz, corner]
    # == a stride-1 VALID conv over the (X+1, Y+1, Z+1) corner table with a
    # constant 0/1 (2, 2, 2) kernel whose tap (1-dx, 1-dy, 1-dz) selects
    # corner (dx, dy, dz)'s channel block. One read of the table, one write
    # of the field; the 8-term sums ride the MXU.
    import numpy as np

    w = np.zeros((2, 2, 2, 8 * slot, C), np.float32)
    k = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                for c in range(C):
                    w[1 - dx, 1 - dy, 1 - dz, k * slot + c, c] = 1.0
                k += 1
    # run the conv through the z-banded 2-D reformulation: XLA's conv3d
    # lowering materializes ~k^3 im2col patch copies in HBM (r5, see
    # models/layers.conv3d_zfold) — on the (1, 201, 201, 17, 256) f32
    # corner table that's ~2.8 GB of hidden traffic inside what was billed
    # as "one table read, one field write"
    from .conv3d import conv3d_zfold

    out = conv3d_zfold(
        tab.reshape(1, X + 1, Y + 1, Z + 1, 8 * slot),
        jnp.asarray(w, dt),
        None,
        (1, 1, 1),
        [(0, 0), (0, 0), (0, 0)],
        (1, 1, 1),
    )
    return out[0]


@lru_cache(maxsize=64)
def _make_fused_sampler(field_shape, field_dtype_name, table_dtype_name):
    field_dtype = jnp.dtype(field_dtype_name)
    table_dtype = (
        jnp.dtype(table_dtype_name) if table_dtype_name is not None else None
    )
    dims = field_shape[:3]
    C = field_shape[-1]

    @jax.custom_vjp
    def f(field, pts_norm):
        t_e, t_o = build_parity_tables(field, table_dtype)
        return sample_parity_tables(t_e, t_o, dims, pts_norm, C)

    def f_fwd(field, pts_norm):
        return f(field, pts_norm), pts_norm

    def f_bwd(pts_norm, g):
        d_field = _corner8_scatter_grad(
            field_shape, dims, pts_norm, g.astype(jnp.float32)
        )
        return d_field.astype(field_dtype), jnp.zeros_like(pts_norm)

    f.defvjp(f_fwd, f_bwd)
    return f


@lru_cache(maxsize=64)
def _make_table_sampler(field_shape, field_dtype_name, table_dtype_name,
                        live_cap=0):
    field_dtype = jnp.dtype(field_dtype_name)
    table_dtype = jnp.dtype(table_dtype_name)
    X, Y, Z, C = field_shape
    dims = (X, Y, Z)
    rows_e = (X + 1) * (Y + 1) * ((Z + 3) // 2)
    rows_o = (X + 1) * (Y + 1) * ((Z + 2) // 2)
    slot = _corner_slot(C)

    @jax.custom_vjp
    def f(field, t_e, t_o, pts_norm):
        del field  # fwd reads the prebuilt tables; field defines d_field
        return sample_parity_tables(t_e, t_o, dims, pts_norm, C)

    def f_fwd(field, t_e, t_o, pts_norm):
        return f(field, t_e, t_o, pts_norm), pts_norm

    def f_bwd(pts_norm, g):
        d_field = _corner8_scatter_grad(
            field_shape, dims, pts_norm, g.astype(jnp.float32),
            live_cap=live_cap,
        )
        return (
            d_field.astype(field_dtype),
            jnp.zeros((rows_e, 4 * slot), table_dtype),
            jnp.zeros((rows_o, 4 * slot), table_dtype),
            jnp.zeros_like(pts_norm),
        )

    f.defvjp(f_fwd, f_bwd)
    return f


def sample_tables_fused(field, t_e, t_o, pts_norm, live_cap: int = 0):
    """Like `sample_field_fused` but with the parity tables prebuilt by the
    caller (hoisted out of ray-chunk loops: build once per scene instead of
    per chunk). The ENTIRE field gradient is produced by this op's backward
    (corner8 scatter) — pass `jax.lax.stop_gradient`-ed tables so autodiff
    doesn't also trace through their construction.

    `live_cap` > 0 enables the exact per-ray live-sample compaction of the
    backward scatter (see `_corner8_scatter_grad`); pts_norm must then be
    (R, S, 3)-shaped with samples along its middle axis.
    """
    fn = _make_table_sampler(
        field.shape, field.dtype.name, t_e.dtype.name, live_cap
    )
    return fn(field, t_e, t_o, pts_norm)


def sample_field_fused(field, pts_norm, table_dtype=None):
    """Trilinear field sampling with the TPU-tuned fwd/bwd split.

    Forward: z-parity VMEM-resident tables, 2 gather descriptors/sample
    (build_parity_tables; pass table_dtype=bfloat16 at flagship scale to
    keep the tables under the VMEM cliff). Backward: single 8-corner-layout
    scatter + dense fold (_corner8_scatter_grad), with NO re-gather — the
    only residual is `pts_norm`. No gradient flows to `pts_norm` (rays are
    geometry inputs; the reference's grid grads are likewise never used —
    `nerf_head.py:209-225` rays don't require grad).
    """
    tname = jnp.dtype(table_dtype).name if table_dtype is not None else None
    fn = _make_fused_sampler(field.shape, field.dtype.name, tname)
    return fn(field, pts_norm)


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
