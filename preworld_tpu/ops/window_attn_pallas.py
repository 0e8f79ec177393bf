"""Fused window attention (Pallas, TPU) for the Swin backbone.

The XLA window-attention path materializes the (nW*B, h, N, N) score
tensor in HBM three times over (QK^T out, +bias/+mask, softmax) — ~2 GB of
traffic per stage-0 block at flagship scale, which is what makes Swin
HBM-bound here (swin FLOPs alone are ~3 ms/forward; measured ~100 ms).
This kernel keeps one window-block's scores in VMEM/registers through
QK^T -> +relative-position bias -> +shift mask -> softmax -> @V, writing
only the (N, d) outputs.

`fused_window_attention` is the raw inference kernel;
`fused_window_attention_vjp` wraps it with a flash-style custom VJP whose
backward kernel recomputes each window's softmax from the saved qkv (never
materializing any (.., N, N) score tensor in HBM in either direction) and
emits the PACKED (Bn, N, 3C) dqkv — exactly the cotangent layout the qkv
Dense's own VJP consumes — plus the (heads, N, N) relative-position-bias
gradient accumulated across grid steps. Semantics + grads oracled against
`WindowMSA`'s XLA math in tests/test_ops.py.

Hard-won TPU constraints baked into the interface:
  * the kernel takes the qkv projection's PACKED (Bn*N, 3C) output and
    lane-slices q/k/v per head INSIDE — operands produced by a
    (Bn, N, 3, h, d) strided slice + reshape crash the Mosaic compile
    (operand-layout assignment), and the packed form is what the Dense
    produces anyway;
  * the (nW, N, N) shift mask must NOT be a multi-MB literal feeding the
    pallas call (compiler crash) — swin builds it on device from the small
    region-id table behind an optimization barrier; and it is BLOCKED per
    grid step (G | nW so each step's windows map to one contiguous mask
    block) — a whole-mask VMEM operand is ~49 MB double-buffered at
    flagship stage 0, which together with any other large op in the
    program overruns VMEM and crashes the compiler;
  * windows ride the SUBLANE dim (G*N rows per grid step); heads stay
    STATIC python-level so all lane slices are compile-time aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(qkv_ref, bias_ref, mask_ref, o_ref, *,
                 G, N, heads, d, scale, masked):
    C = heads * d

    def per_window(g, _):
        # the 16-alignment hint is only valid when N itself is 16-aligned
        # (callers gate on this; guard here too so a direct call can't
        # hand the compiler a false address hint)
        base = pl.multiple_of(g * N, 16) if N % 16 == 0 else g * N

        for h in range(heads):
            qh = qkv_ref[pl.ds(base, N), h * d : (h + 1) * d]
            kh = qkv_ref[pl.ds(base, N), C + h * d : C + (h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h * N : (h + 1) * N, :]
            if masked:
                s = s + mask_ref[pl.ds(base, N), :]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            vh = qkv_ref[pl.ds(base, N), 2 * C + h * d : 2 * C + (h + 1) * d]
            oh = jax.lax.dot_general(
                p.astype(qkv_ref.dtype), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[pl.ds(base, N), h * d : (h + 1) * d] = oh.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, G, per_window, 0)


@functools.partial(
    jax.jit, static_argnames=("heads", "window_g", "interpret")
)
def fused_window_attention(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray | None,
    heads: int,
    window_g: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed MHSA: softmax(q k^T * scale + bias [+ mask]) v, fused.

    Args:
      qkv: (Bn, N, 3C) packed projection output, lanes ordered
        [q heads | k heads | v heads]; q UNSCALED (the kernel applies
        d**-0.5).
      bias: (heads, N, N) relative-position bias (f32).
      mask: (nW, N, N) shifted-window mask or None; window w = i % nW.
        Build it on device (see module docstring).
    Returns:
      (Bn, N, C) attention output in qkv.dtype.
    """
    Bn, N, C3 = qkv.shape
    C = C3 // 3
    d = C // heads
    masked = mask is not None
    G = window_g
    while G > 1 and (Bn % G or (masked and mask.shape[0] % G)):
        G -= 1
    n_steps = Bn // G
    if mask is None:
        mask = jnp.zeros((G, N, N), jnp.float32)
    nW = mask.shape[0]
    n_mask_blocks = nW // G

    kernel = functools.partial(
        _attn_kernel, G=G, N=N, heads=heads, d=d,
        scale=float(d) ** -0.5, masked=masked,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((G * N, C3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * N, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (G * N, N),
                lambda i, nb=n_mask_blocks: (i % nb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((G * N, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn * N, C), qkv.dtype),
        # the unrolled python head loop allocates per-head (N, N) f32
        # temporaries on the kernel stack; at stage 3 (heads=32) that
        # exceeds the default 16 MB scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        qkv.reshape(Bn * N, C3),
        bias.reshape(heads * N, N).astype(jnp.float32),
        mask.reshape(nW * N, N).astype(jnp.float32),
    )
    return out.reshape(Bn, N, C)


def _attn_bwd_kernel(qkv_ref, bias_ref, mask_ref, do_ref,
                     dqkv_ref, dbias_ref, *,
                     G, N, heads, d, scale, masked):
    """Flash-style window-attention backward: recompute each window's
    softmax from qkv (2 extra (N,N,d) matmuls) instead of saving the
    (Bn, h, N, N) probabilities; 5 MXU contractions per window-head.
    dbias accumulates across sequential grid steps into one block."""
    C = heads * d
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)

    def per_window(g, _):
        base = pl.multiple_of(g * N, 16) if N % 16 == 0 else g * N

        for h in range(heads):
            qh = qkv_ref[pl.ds(base, N), h * d : (h + 1) * d]
            kh = qkv_ref[pl.ds(base, N), C + h * d : C + (h + 1) * d]
            vh = qkv_ref[pl.ds(base, N), 2 * C + h * d : 2 * C + (h + 1) * d]
            doh = do_ref[pl.ds(base, N), h * d : (h + 1) * d]

            s = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h * N : (h + 1) * N, :]
            if masked:
                s = s + mask_ref[pl.ds(base, N), :]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)  # (N, N) f32

            pb = p.astype(qkv_ref.dtype)
            # dv = p^T do
            dv = jax.lax.dot_general(
                pb, doh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dp = do v^T
            dp = jax.lax.dot_general(
                doh, vh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # softmax vjp: ds = p * (dp - rowsum(dp * p))
            row = jnp.sum(dp * p, axis=1, keepdims=True)
            ds = p * (dp - row)  # grad wrt s (post-scale/bias/mask)
            dbias_ref[h * N : (h + 1) * N, :] += ds
            dsb = ds.astype(qkv_ref.dtype)
            dq = jax.lax.dot_general(
                dsb, kh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk = jax.lax.dot_general(
                dsb, qh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dt = dqkv_ref.dtype
            dqkv_ref[pl.ds(base, N), h * d : (h + 1) * d] = dq.astype(dt)
            dqkv_ref[pl.ds(base, N), C + h * d : C + (h + 1) * d] = (
                dk.astype(dt)
            )
            dqkv_ref[pl.ds(base, N), 2 * C + h * d : 2 * C + (h + 1) * d] = (
                dv.astype(dt)
            )
        return 0

    jax.lax.fori_loop(0, G, per_window, 0)


@functools.partial(
    jax.jit, static_argnames=("heads", "window_g", "interpret")
)
def _fused_window_attention_bwd(
    qkv, bias, mask, do, heads, window_g=8, interpret=False
):
    """Backward pass: (dqkv (Bn, N, 3C), dbias (heads, N, N))."""
    Bn, N, C3 = qkv.shape
    C = C3 // 3
    d = C // heads
    masked = mask is not None
    G = window_g
    while G > 1 and (Bn % G or (masked and mask.shape[0] % G)):
        G -= 1
    n_steps = Bn // G
    if mask is None:
        mask = jnp.zeros((G, N, N), jnp.float32)
    nW = mask.shape[0]
    n_mask_blocks = nW // G

    kernel = functools.partial(
        _attn_bwd_kernel, G=G, N=N, heads=heads, d=d,
        scale=float(d) ** -0.5, masked=masked,
    )
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((G * N, C3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * N, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (G * N, N),
                lambda i, nb=n_mask_blocks: (i % nb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((G * N, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G * N, C3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # single block revisited by every step -> sequential accumulate
            pl.BlockSpec((heads * N, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bn * N, C3), qkv.dtype),
            jax.ShapeDtypeStruct((heads * N, N), jnp.float32),
        ],
        # see the forward: the backward's stack is larger still (s, p, dp,
        # ds per unrolled head) — 19.1 MB at stage 3 vs the 16 MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        qkv.reshape(Bn * N, C3),
        bias.reshape(heads * N, N).astype(jnp.float32),
        mask.reshape(nW * N, N).astype(jnp.float32),
        do.reshape(Bn * N, C).astype(qkv.dtype),
    )
    return dqkv.reshape(Bn, N, C3), dbias.reshape(heads, N, N)


# ---------------------------------------------------------------------------
# Band variant (r4): consume qkv in the natural (B, Hp, Wp, 3C) image layout
# and write (B, Hp, Wp, C) — window partition/reverse/pad-slice relayouts
# (XLA materializes ~5-7 full-size copies per block for the 6-D transposes,
# ~1.4 GB r+w per flagship stage-0 block) disappear into the band DMA. The
# kernel walks window PAIRS with a fori_loop (pair offsets 2*ws = 24 px are
# 8-sublane-aligned, satisfying Mosaic's dynamic-slice alignment; a lone
# tail window at (nW-1)*ws — always 8-aligned when nW is odd — is emitted
# statically), collapsing each (ws, ws, 3C) window slab to (N, 3C) scratch
# rows via static in-VMEM row copies. Attention math per window is the same
# 5-contraction structure as the flat kernels above.
# ---------------------------------------------------------------------------


def _band_collapse(qkv_ref, wscr, off, ws, n_win, C3=None):
    """Copy n_win adjacent windows at sublane offset `off` of the band into
    (n_win*N, 3C) scratch rows (window-major, row-major within)."""
    N = ws * ws
    for r in range(ws):
        rows = qkv_ref[0, r, pl.ds(off, n_win * ws), :]  # (n_win*ws, 3C)
        for k in range(n_win):
            wscr[k * N + r * ws : k * N + (r + 1) * ws, :] = (
                rows[k * ws : (k + 1) * ws, :]
            )


def _band_scatter(o_ref, oscr, off, ws, n_win):
    """Inverse of _band_collapse for the (n_win*N, C) output scratch."""
    N = ws * ws
    for r in range(ws):
        pieces = [
            oscr[k * N + r * ws : k * N + (r + 1) * ws, :]
            for k in range(n_win)
        ]
        o_ref[0, r, pl.ds(off, n_win * ws), :] = (
            jnp.concatenate(pieces, axis=0) if n_win > 1 else pieces[0]
        )


def _attend_one(wscr, oscr, bias_ref, mask_ref, base, wj, *,
                N, heads, d, scale, masked):
    """Softmax attention for the window at scratch rows [base, base+N)."""
    C = heads * d
    for h in range(heads):
        qh = wscr[base : base + N, h * d : (h + 1) * d]
        kh = wscr[base : base + N, C + h * d : C + (h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + bias_ref[h * N : (h + 1) * N, :]
        if masked:
            s = s + mask_ref[pl.ds(pl.multiple_of(wj * N, 16), N), :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        vh = wscr[base : base + N, 2 * C + h * d : 2 * C + (h + 1) * d]
        oh = jax.lax.dot_general(
            p.astype(wscr.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        oscr[base : base + N, h * d : (h + 1) * d] = oh.astype(oscr.dtype)


def _band_attn_kernel(qkv_ref, bias_ref, mask_ref, o_ref, wscr, oscr, *,
                      nW, ws, heads, d, scale, masked):
    N = ws * ws
    C = heads * d

    def pair(j2, _):
        off = pl.multiple_of(j2 * (2 * ws), 8)
        _band_collapse(qkv_ref, wscr, off, ws, 2)
        for k in range(2):
            _attend_one(
                wscr, oscr, bias_ref, mask_ref, k * N, 2 * j2 + k,
                N=N, heads=heads, d=d, scale=scale, masked=masked,
            )
        _band_scatter(o_ref, oscr, off, ws, 2)
        return 0

    jax.lax.fori_loop(0, nW // 2, pair, 0)
    if nW % 2:
        off = (nW - 1) * ws  # static; 8-aligned whenever nW is odd
        _band_collapse(qkv_ref, wscr, off, ws, 1)
        _attend_one(
            wscr, oscr, bias_ref, mask_ref, 0, nW - 1,
            N=N, heads=heads, d=d, scale=scale, masked=masked,
        )
        _band_scatter(o_ref, oscr, off, ws, 1)


@functools.partial(
    jax.jit, static_argnames=("heads", "ws", "interpret")
)
def band_window_attention(qkv, bias, mask, heads, ws, interpret=False):
    """Windowed MHSA over image-layout qkv (see the band section docstring).

    Args:
      qkv: (B, Hp, Wp, 3C) packed projection output, Hp/Wp multiples of ws.
      bias: (heads, N, N) relative-position bias.
      mask: (nH*nW, N, N) shifted-window mask (row-major window order) or
        None.
    Returns: (B, Hp, Wp, C).
    """
    B, Hp, Wp, C3 = qkv.shape
    C = C3 // 3
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
    kernel = functools.partial(
        _band_attn_kernel, nW=nW, ws=ws, heads=heads, d=d,
        scale=float(d) ** -0.5, masked=masked,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, ws, Wp, C3), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * N, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((1, ws, Wp, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * N, C3), qkv.dtype),
            pltpu.VMEM((2 * N, C), qkv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qkv, bias.reshape(heads * N, N).astype(jnp.float32), mask_arr)


def _attend_one_bwd(wscr, doscr, dscr, bias_ref, mask_ref, dbias_ref,
                    base, wj, *, N, heads, d, scale, masked):
    """Flash-style backward for one window (recomputed softmax; see
    _attn_bwd_kernel for the math)."""
    C = heads * d
    for h in range(heads):
        qh = wscr[base : base + N, h * d : (h + 1) * d]
        kh = wscr[base : base + N, C + h * d : C + (h + 1) * d]
        vh = wscr[base : base + N, 2 * C + h * d : 2 * C + (h + 1) * d]
        doh = doscr[base : base + N, h * d : (h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + bias_ref[h * N : (h + 1) * N, :]
        if masked:
            s = s + mask_ref[pl.ds(pl.multiple_of(wj * N, 16), N), :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        pb = p.astype(wscr.dtype)
        dv = jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = p * (dp - row)
        dbias_ref[h * N : (h + 1) * N, :] += ds
        dsb = ds.astype(wscr.dtype)
        dq = jax.lax.dot_general(
            dsb, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            dsb, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dt = dscr.dtype
        dscr[base : base + N, h * d : (h + 1) * d] = dq.astype(dt)
        dscr[base : base + N, C + h * d : C + (h + 1) * d] = dk.astype(dt)
        dscr[base : base + N, 2 * C + h * d : 2 * C + (h + 1) * d] = (
            dv.astype(dt)
        )


def _band_attn_bwd_kernel(qkv_ref, bias_ref, mask_ref, do_ref,
                          dqkv_ref, dbias_ref, wscr, doscr, dscr, *,
                          nW, ws, heads, d, scale, masked):
    N = ws * ws
    C = heads * d

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)

    def collapse_do(off, n_win):
        for r in range(ws):
            rows = do_ref[0, r, pl.ds(off, n_win * ws), :]
            for k in range(n_win):
                doscr[k * N + r * ws : k * N + (r + 1) * ws, :] = (
                    rows[k * ws : (k + 1) * ws, :]
                )

    def pair(j2, _):
        off = pl.multiple_of(j2 * (2 * ws), 8)
        _band_collapse(qkv_ref, wscr, off, ws, 2)
        collapse_do(off, 2)
        for k in range(2):
            _attend_one_bwd(
                wscr, doscr, dscr, bias_ref, mask_ref, dbias_ref,
                k * N, 2 * j2 + k,
                N=N, heads=heads, d=d, scale=scale, masked=masked,
            )
        _band_scatter(dqkv_ref, dscr, off, ws, 2)
        return 0

    jax.lax.fori_loop(0, nW // 2, pair, 0)
    if nW % 2:
        off = (nW - 1) * ws
        _band_collapse(qkv_ref, wscr, off, ws, 1)
        collapse_do(off, 1)
        _attend_one_bwd(
            wscr, doscr, dscr, bias_ref, mask_ref, dbias_ref, 0, nW - 1,
            N=N, heads=heads, d=d, scale=scale, masked=masked,
        )
        _band_scatter(dqkv_ref, dscr, off, ws, 1)


@functools.partial(
    jax.jit, static_argnames=("heads", "ws", "interpret")
)
def _band_window_attention_bwd(qkv, bias, mask, do, heads, ws,
                               interpret=False):
    B, Hp, Wp, C3 = qkv.shape
    C = C3 // 3
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
    kernel = functools.partial(
        _band_attn_bwd_kernel, nW=nW, ws=ws, heads=heads, d=d,
        scale=float(d) ** -0.5, masked=masked,
    )
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, ws, Wp, C3), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * N, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
            pl.BlockSpec((1, ws, Wp, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ws, Wp, C3), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # single block revisited by every step -> sequential accumulate
            pl.BlockSpec((heads * N, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wp, C3), qkv.dtype),
            jax.ShapeDtypeStruct((heads * N, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * N, C3), qkv.dtype),
            pltpu.VMEM((2 * N, C), qkv.dtype),
            pltpu.VMEM((2 * N, C3), qkv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qkv, bias.reshape(heads * N, N).astype(jnp.float32), mask_arr,
      do.astype(qkv.dtype))
    return dqkv, dbias.reshape(heads, N, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def band_window_attention_vjp(qkv, bias, mask, heads, ws, interpret=False):
    """`band_window_attention` with the flash-style backward (training
    path). Differentiable in qkv and bias; the shift mask is geometry."""
    return band_window_attention(qkv, bias, mask, heads, ws, interpret)


def _bwa_fwd(qkv, bias, mask, heads, ws, interpret):
    return band_window_attention(qkv, bias, mask, heads, ws, interpret), (
        qkv, bias, mask
    )


def _bwa_bwd(heads, ws, interpret, res, do):
    qkv, bias, mask = res
    dqkv, dbias = _band_window_attention_bwd(
        qkv, bias, mask, do, heads, ws, interpret
    )
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, dbias.astype(bias.dtype), dmask


band_window_attention_vjp.defvjp(_bwa_fwd, _bwa_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def fused_window_attention_vjp(
    qkv, bias, mask, heads, window_g=8, interpret=False
):
    """`fused_window_attention` with a flash-style backward (training path).

    Differentiable in qkv and bias; the shift mask is geometry (zeros /
    -100 region constants — reference `swin.py:163-174`) and gets no
    cotangent. Residuals are just (qkv, bias, mask): the backward kernel
    recomputes window softmaxes in VMEM, so neither direction ever writes
    an (.., N, N) score tensor to HBM.
    """
    return fused_window_attention(
        qkv, bias, mask, heads, window_g, interpret
    )


def _fwa_fwd(qkv, bias, mask, heads, window_g, interpret):
    out = fused_window_attention(qkv, bias, mask, heads, window_g, interpret)
    return out, (qkv, bias, mask)


def _fwa_bwd(heads, window_g, interpret, res, do):
    qkv, bias, mask = res
    dqkv, dbias = _fused_window_attention_bwd(
        qkv, bias, mask, do, heads, window_g, interpret
    )
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, dbias.astype(bias.dtype), dmask


fused_window_attention_vjp.defvjp(_fwa_fwd, _fwa_bwd)
