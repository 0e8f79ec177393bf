"""Fully-fused Swin attention half-block (Pallas, TPU).

One kernel computes  out = x + s * proj(attn(zeropad(LN1(x))))  directly on
the PADDED (B, Hp, Wp, C) image layout: LayerNorm, pad-token zeroing, the
qkv projection, windowed multi-head attention (relative-position bias +
shift mask), the output projection and the residual add never leave VMEM.

Why: after the r4 band kernel removed the window partition/reverse
relayouts, the remaining per-block HBM traffic was the qkv Dense
(write+read of a 3C-wide tensor), the proj Dense round trip, the LN1 round
trip, per-block pad/slice copies and the residual re-read — together ~5x
the 2-tensor (read x / write out) floor. This kernel IS that floor; padding
becomes STAGE-persistent (models/swin.py pads once per stage and slices
once at the end), with in-kernel masking reproducing the reference's exact
"zero-pad after LN1" semantics (`mmdet3d/models/backbones/swin.py` Swin
block: norm1 -> pad -> [roll] -> window attention -> [unroll] -> slice ->
+residual).

Shift handling: the caller rolls x by (-shift, -shift) BEFORE the kernel
and rolls the output back (two cheap XLA copies on half the blocks); the
kernel's valid-region mask accounts for the roll so pad tokens are zeroed
at their ROLLED positions.

`fused_swin_attn_block` is the raw kernel; `fused_swin_attn_block_vjp`
adds a flash-style custom VJP whose backward recomputes LN/qkv/softmax per
band in VMEM and accumulates all weight/bias/LN-affine/rel-bias gradients
across sequential grid steps (same recompute discipline as
window_attn_pallas / swin_mlp_pallas). Semantics + grads oracled against
the XLA SwinBlock path in tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _valid_mask(band, ws, Wp, Hp, H, W, shift):
    """(ws, Wp) bool: True where the (rolled) position holds a real token.

    Position (r, c) of the rolled tensor maps to original row
    (r + shift) mod Hp — valid iff that is < H; rows [H-shift, Hp-shift)
    are the pad rows, everything else (including the wrapped tail) is real.
    """
    rg = band * ws + jax.lax.broadcasted_iota(jnp.int32, (ws, Wp), 0)
    cg = jax.lax.broadcasted_iota(jnp.int32, (ws, Wp), 1)
    if shift > 0:
        rok = (rg < H - shift) | (rg >= Hp - shift)
        cok = (cg < W - shift) | (cg >= Wp - shift)
    else:
        rok = rg < H
        cok = cg < W
    # f32 0/1 (not bool): Mosaic can't minor-dim-expand an i1 vector
    return jnp.where(rok & cok, 1.0, 0.0)


def _ln_band(x_ref, lnsb_ref, ok, eps=1e-5):
    """LN over channels of the (ws, Wp, C) band + pad zeroing.

    Returns (y, xf, xhat, rstd) — the extras feed the backward recompute.
    """
    xf = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(xf, axis=2, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=2, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y = xhat * lnsb_ref[0:1, :] + lnsb_ref[1:2, :]
    y = y * ok[:, :, None]
    return y, xf, xhat, rstd


def _collapse(src_ref, dst_scr, off, ws, n_win, lead4=False):
    """Copy n_win adjacent windows of a (ws, Wp, *) band scratch — or a
    (1, ws, Wp, *) banded input ref when lead4 — at sublane offset `off`
    into (n_win*N, *) scratch rows (window-major, row-major within)."""
    N = ws * ws
    for r in range(ws):
        if lead4:
            rows = src_ref[0, r, pl.ds(off, n_win * ws), :]
        else:
            rows = src_ref[r, pl.ds(off, n_win * ws), :]
        for k in range(n_win):
            dst_scr[k * N + r * ws : k * N + (r + 1) * ws, :] = (
                rows[k * ws : (k + 1) * ws, :]
            )


def _attend_one(qscr, oscr, sscr, pscr, bias_ref, mask_ref, base, wj, *,
                N, heads, d, scale, masked):
    """Softmax attention for the window at scratch rows [base, base+N).

    Heads are STACKED along the sublane dim ((heads*N, N) scratch) so the
    bias add / max / exp / normalize run as single ops over all heads —
    the kernel is VPU-issue-bound, and the per-head chain was ~10 ops/head
    where the stacked form is ~3/head + 6 total."""
    C = heads * d
    for h in range(heads):
        qh = qscr[base : base + N, h * d : (h + 1) * d]
        kh = qscr[base : base + N, C + h * d : C + (h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if masked:
            s = s + mask_ref[pl.ds(pl.multiple_of(wj * N, 16), N), :]
        sscr[h * N : (h + 1) * N, :] = s
    s = sscr[:, :] + bias_ref[:, :]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    pscr[:, :] = p.astype(pscr.dtype)
    for h in range(heads):
        vh = qscr[base : base + N, 2 * C + h * d : 2 * C + (h + 1) * d]
        oh = jax.lax.dot_general(
            pscr[h * N : (h + 1) * N, :], vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        oscr[base : base + N, h * d : (h + 1) * d] = oh.astype(oscr.dtype)


def _attend_one_bwd(qscr, doscr, dqscr, sscr, pscr, dpscr, bias_ref,
                    mask_ref, dbias_ref, base, wj, *,
                    N, heads, d, scale, masked):
    """Flash-style backward for one window (recomputed softmax); heads
    stacked on the sublane dim like the forward (see _attend_one)."""
    C = heads * d
    for h in range(heads):
        qh = qscr[base : base + N, h * d : (h + 1) * d]
        kh = qscr[base : base + N, C + h * d : C + (h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if masked:
            s = s + mask_ref[pl.ds(pl.multiple_of(wj * N, 16), N), :]
        sscr[h * N : (h + 1) * N, :] = s
    s = sscr[:, :] + bias_ref[:, :]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    pscr[:, :] = p.astype(pscr.dtype)
    for h in range(heads):
        vh = qscr[base : base + N, 2 * C + h * d : 2 * C + (h + 1) * d]
        doh = doscr[base : base + N, h * d : (h + 1) * d]
        dv = jax.lax.dot_general(
            pscr[h * N : (h + 1) * N, :], doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqscr[base : base + N, 2 * C + h * d : 2 * C + (h + 1) * d] = (
            dv.astype(dqscr.dtype)
        )
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpscr[h * N : (h + 1) * N, :] = dp
    dp = dpscr[:, :]
    row = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = p * (dp - row)
    dbias_ref[:, :] += ds
    pscr[:, :] = ds.astype(pscr.dtype)  # reuse as the ds scratch
    for h in range(heads):
        qh = qscr[base : base + N, h * d : (h + 1) * d]
        kh = qscr[base : base + N, C + h * d : C + (h + 1) * d]
        dsb = pscr[h * N : (h + 1) * N, :]
        dq = jax.lax.dot_general(
            dsb, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            dsb, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dt = dqscr.dtype
        dqscr[base : base + N, h * d : (h + 1) * d] = dq.astype(dt)
        dqscr[base : base + N, C + h * d : C + (h + 1) * d] = dk.astype(dt)


def _blk_kernel(x_ref, lnsb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                bias_ref, mask_ref, rs_ref, o_ref, yscr, y2scr, qscr, oscr,
                sscr, pscr,
                *, nW, ws, heads, d, scale, masked, Hp, Wp, H, W, shift):
    N = ws * ws
    band = pl.program_id(1)
    ok = _valid_mask(band, ws, Wp, Hp, H, W, shift)
    y, _, _, _ = _ln_band(x_ref, lnsb_ref, ok)
    yscr[:, :, :] = y.astype(yscr.dtype)
    rs = rs_ref[pl.program_id(0), 0]

    def do_windows(off, n_win, wj0):
        _collapse(yscr, y2scr, off, ws, n_win)
        n = n_win * N
        qkv = jax.lax.dot_general(
            y2scr[0:n, :], wqkv_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0:1, :]
        qscr[0:n, :] = qkv.astype(qscr.dtype)
        for k in range(n_win):
            _attend_one(qscr, oscr, sscr, pscr, bias_ref, mask_ref, k * N,
                        wj0 + k, N=N, heads=heads, d=d, scale=scale,
                        masked=masked)
        po = jax.lax.dot_general(
            oscr[0:n, :], wproj_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[0:1, :]
        po = po * rs
        for r in range(ws):
            resid = x_ref[0, r, pl.ds(off, n_win * ws), :].astype(jnp.float32)
            pieces = [
                po[k * N + r * ws : k * N + (r + 1) * ws, :]
                for k in range(n_win)
            ]
            rows = jnp.concatenate(pieces, axis=0) if n_win > 1 else pieces[0]
            o_ref[0, r, pl.ds(off, n_win * ws), :] = (
                resid + rows
            ).astype(o_ref.dtype)

    def pair(j2, _):
        off = pl.multiple_of(j2 * (2 * ws), 8)
        do_windows(off, 2, 2 * j2)
        return 0

    jax.lax.fori_loop(0, nW // 2, pair, 0)
    if nW % 2:
        do_windows((nW - 1) * ws, 1, nW - 1)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "ws", "H", "W", "shift", "interpret"),
)
def fused_swin_attn_block(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask, row_scale,
    heads, ws, H, W, shift, interpret=False,
):
    """out = x + row_scale * proj(attn(zeropad(LN(x)))) on padded layout.

    Args:
      x: (B, Hp, Wp, C), Hp/Wp multiples of ws; pre-ROLLED by (-shift,
        -shift) when shift > 0; pad content arbitrary (zeroed in-kernel
        after LN — reference zero-pad-after-norm1 semantics).
      ln_scale/ln_bias: (C,) LayerNorm affine (eps 1e-5).
      wqkv/bqkv: (C, 3C), (3C,); wproj/bproj: (C, C), (C,).
      bias: (heads, N, N) relative-position bias (f32).
      mask: (nH*nW, N, N) shifted-window mask (row-major) or None.
      row_scale: (B,) drop_path branch scale per image, or None.
      H, W: the REAL (unpadded) spatial extent; shift: the roll amount.
    Returns: (B, Hp, Wp, C) in x.dtype (pad region = x + branch garbage,
      sliced away by the caller at stage end).
    """
    B, Hp, Wp, C = x.shape
    d = C // heads
    N = ws * ws
    nH, nW = Hp // ws, Wp // ws
    masked = mask is not None
    if mask is None:
        mask_arr = jnp.zeros((N, N), jnp.float32)
        mask_spec = pl.BlockSpec((N, N), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_arr = mask.reshape(nH * nW * N, N).astype(jnp.float32)
        mask_spec = pl.BlockSpec((nW * N, N), lambda b, i: (i, 0),
                                 memory_space=pltpu.VMEM)
    rs = (
        jnp.ones((B, 1), jnp.float32) if row_scale is None
        else row_scale.reshape(B, 1).astype(jnp.float32)
    )
    lnsb = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    kernel = functools.partial(
        _blk_kernel, nW=nW, ws=ws, heads=heads, d=d,
        scale=float(d) ** -0.5, masked=masked,
        Hp=Hp, Wp=Wp, H=H, W=W, shift=shift,
    )
    const = lambda b, i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, ws, Wp, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * N, N), const, memory_space=pltpu.VMEM),
            mask_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, Wp, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((ws, Wp, C), x.dtype),
            pltpu.VMEM((2 * N, C), x.dtype),
            pltpu.VMEM((2 * N, 3 * C), x.dtype),
            pltpu.VMEM((2 * N, C), x.dtype),
            pltpu.VMEM((heads * N, N), jnp.float32),
            pltpu.VMEM((heads * N, N), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # no cross-step state in the FORWARD (the backward's weight-grad
            # accumulators need sequential revisits) -> let Mosaic pipeline
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        x,
        lnsb,
        wqkv.astype(x.dtype),
        bqkv.reshape(1, 3 * C).astype(jnp.float32),
        wproj.astype(x.dtype),
        bproj.reshape(1, C).astype(jnp.float32),
        bias.reshape(heads * N, N).astype(jnp.float32),
        mask_arr,
        rs,
    )


def _blk_bwd_kernel(x_ref, lnsb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                    bias_ref, mask_ref, rs_ref, do_ref,
                    dx_ref, dlnsb_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                    dbproj_ref, dbias_ref,
                    yscr, dyscr, y2scr, qscr, oscr, doscr, dqscr,
                    sscr, pscr, dpscr,
                    *, nW, ws, heads, d, scale, masked, Hp, Wp, H, W, shift):
    N = ws * ws
    band = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (band == 0))
    def _init():
        dlnsb_ref[:, :] = jnp.zeros_like(dlnsb_ref)
        dwqkv_ref[:, :] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:, :] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:, :] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:, :] = jnp.zeros_like(dbproj_ref)
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)

    ok = _valid_mask(band, ws, Wp, Hp, H, W, shift)
    y, _, xhat, rstd = _ln_band(x_ref, lnsb_ref, ok)
    yscr[:, :, :] = y.astype(yscr.dtype)
    rs = rs_ref[pl.program_id(0), 0]

    def bwd_windows(off, n_win, wj0):
        n = n_win * N
        _collapse(yscr, y2scr, off, ws, n_win)
        qkv = jax.lax.dot_general(
            y2scr[0:n, :], wqkv_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0:1, :]
        qscr[0:n, :] = qkv.astype(qscr.dtype)
        _collapse(do_ref, doscr, off, ws, n_win, lead4=True)
        # recompute the forward attention output (for dWproj)
        for k in range(n_win):
            _attend_one(qscr, oscr, sscr, pscr, bias_ref, mask_ref, k * N,
                        wj0 + k, N=N, heads=heads, d=d, scale=scale,
                        masked=masked)
        dob = doscr[0:n, :].astype(jnp.float32) * rs  # branch cotangent
        dwproj_ref[:, :] += jax.lax.dot_general(
            oscr[0:n, :], dob.astype(oscr.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbproj_ref[0:1, :] += jnp.sum(dob, axis=0, keepdims=True)
        dattn = jax.lax.dot_general(
            dob.astype(qscr.dtype), wproj_ref[:, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        doscr[0:n, :] = dattn.astype(doscr.dtype)
        for k in range(n_win):
            _attend_one_bwd(qscr, doscr, dqscr, sscr, pscr, dpscr, bias_ref,
                            mask_ref, dbias_ref, k * N, wj0 + k,
                            N=N, heads=heads, d=d, scale=scale, masked=masked)
        dq2 = dqscr[0:n, :]
        dwqkv_ref[:, :] += jax.lax.dot_general(
            y2scr[0:n, :], dq2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbqkv_ref[0:1, :] += jnp.sum(
            dq2.astype(jnp.float32), axis=0, keepdims=True
        )
        dy2 = jax.lax.dot_general(
            dq2, wqkv_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for r in range(ws):
            pieces = [
                dy2[k * N + r * ws : k * N + (r + 1) * ws, :]
                for k in range(n_win)
            ]
            rows = jnp.concatenate(pieces, axis=0) if n_win > 1 else pieces[0]
            dyscr[r, pl.ds(off, n_win * ws), :] = rows

    def pair(j2, _):
        off = pl.multiple_of(j2 * (2 * ws), 8)
        bwd_windows(off, 2, 2 * j2)
        return 0

    jax.lax.fori_loop(0, nW // 2, pair, 0)
    if nW % 2:
        bwd_windows((nW - 1) * ws, 1, nW - 1)

    # LN backward over the whole band (dy zero-masked: the forward zeroed
    # pad tokens AFTER the affine, so pads contribute nothing anywhere)
    dy = dyscr[:, :, :] * ok[:, :, None]
    C = xhat.shape[-1]
    dlnsb_ref[0:1, :] += jnp.sum(
        (dy * xhat).reshape(-1, C), axis=0, keepdims=True
    )
    dlnsb_ref[1:2, :] += jnp.sum(dy.reshape(-1, C), axis=0, keepdims=True)
    dxhat = dy * lnsb_ref[0:1, :]
    m1 = jnp.mean(dxhat, axis=2, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=2, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[0] = (do_ref[0].astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "ws", "H", "W", "shift", "interpret"),
)
def _fused_swin_attn_block_bwd(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask, row_scale,
    do, heads, ws, H, W, shift, interpret=False,
):
    B, Hp, Wp, C = x.shape
    d = C // heads
    N = ws * ws
    nH, nW = Hp // ws, Wp // ws
    masked = mask is not None
    if mask is None:
        mask_arr = jnp.zeros((N, N), jnp.float32)
        mask_spec = pl.BlockSpec((N, N), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_arr = mask.reshape(nH * nW * N, N).astype(jnp.float32)
        mask_spec = pl.BlockSpec((nW * N, N), lambda b, i: (i, 0),
                                 memory_space=pltpu.VMEM)
    rs = (
        jnp.ones((B, 1), jnp.float32) if row_scale is None
        else row_scale.reshape(B, 1).astype(jnp.float32)
    )
    lnsb = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    kernel = functools.partial(
        _blk_bwd_kernel, nW=nW, ws=ws, heads=heads, d=d,
        scale=float(d) ** -0.5, masked=masked,
        Hp=Hp, Wp=Wp, H=H, W=W, shift=shift,
    )
    const = lambda b, i: (0, 0)
    banded_in = pl.BlockSpec((1, ws, Wp, C), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            banded_in,
            pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * N, N), const, memory_space=pltpu.VMEM),
            mask_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            banded_in,
        ],
        out_specs=[
            banded_in,
            # accumulators: single block revisited by every grid step
            pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * N, N), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wp, C), x.dtype),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((heads * N, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ws, Wp, C), x.dtype),
            pltpu.VMEM((ws, Wp, C), jnp.float32),
            pltpu.VMEM((2 * N, C), x.dtype),
            pltpu.VMEM((2 * N, 3 * C), x.dtype),
            pltpu.VMEM((2 * N, C), x.dtype),
            pltpu.VMEM((2 * N, C), x.dtype),
            pltpu.VMEM((2 * N, 3 * C), x.dtype),
            pltpu.VMEM((heads * N, N), jnp.float32),
            pltpu.VMEM((heads * N, N), x.dtype),
            pltpu.VMEM((heads * N, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x,
        lnsb,
        wqkv.astype(x.dtype),
        bqkv.reshape(1, 3 * C).astype(jnp.float32),
        wproj.astype(x.dtype),
        bias.reshape(heads * N, N).astype(jnp.float32),
        mask_arr,
        rs,
        do.astype(x.dtype),
    )
    dx, dlnsb, dwqkv, dbqkv, dwproj, dbproj, dbias = outs
    return (
        dx,
        dlnsb[0].astype(ln_scale.dtype),
        dlnsb[1].astype(ln_bias.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv[0].astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj[0].astype(bproj.dtype),
        dbias.reshape(heads, N, N).astype(bias.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def fused_swin_attn_block_vjp(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask, row_scale,
    heads, ws, H, W, shift, interpret=False,
):
    """`fused_swin_attn_block` with the recompute-in-VMEM backward.

    Differentiable in x, the LN affine, both projections and the
    relative-position bias; the shift mask is geometry and `row_scale`
    (drop_path) is a random regularizer — both get zero cotangents.
    """
    return fused_swin_attn_block(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask,
        row_scale, heads, ws, H, W, shift, interpret,
    )


def _fsab_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask,
              row_scale, heads, ws, H, W, shift, interpret):
    out = fused_swin_attn_block(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask,
        row_scale, heads, ws, H, W, shift, interpret,
    )
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias,
                 mask, row_scale)


def _fsab_bwd(heads, ws, H, W, shift, interpret, res, do):
    (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask,
     row_scale) = res
    dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj, dbias = (
        _fused_swin_attn_block_bwd(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask,
            row_scale, do, heads, ws, H, W, shift, interpret,
        )
    )
    dmask = None if mask is None else jnp.zeros_like(mask)
    drs = None if row_scale is None else jnp.zeros_like(row_scale)
    return (dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj, dbias, dmask, drs)


fused_swin_attn_block_vjp.defvjp(_fsab_fwd, _fsab_bwd)
