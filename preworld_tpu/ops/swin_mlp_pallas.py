"""Fused Swin MLP sub-block (Pallas, TPU): out = x + fc2(gelu(fc1(LN(x)))).

The XLA path materializes the 4C-wide hidden activation in HBM twice
(fc1 write + fc2 read) — ~550 MB per flagship Swin block, the largest
single term in the backbone's HBM traffic (encode ~82 GB of a 176 GB
forward). This kernel streams row tiles through LN -> fc1 -> exact GELU ->
fc2 -> +residual entirely in VMEM: per block it reads x once and writes
the output once (plus the weights, resident across grid steps).

Reference semantics: `swin.py` FFN (LN eps 1e-5, exact erf GELU, bias on
both fcs) — see models/swin.py::SwinBlock.

`fused_swin_mlp` is the raw kernel; `fused_swin_mlp_vjp` adds a custom VJP
whose backward kernel recomputes LN / fc1 / GELU per row-block in VMEM
(5 chunked MXU contractions vs the forward's 2) and accumulates the
weight / bias / LN-affine gradients across sequential grid steps, so the
4C hidden never round-trips HBM in training either.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic has
    no erf lowering; at bf16 output resolution (~1e-2) this is exact."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = 1.0 - (
        ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
         - 0.284496736) * t + 0.254829592
    ) * t * jnp.exp(-ax * ax)
    return s * y


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf(x * _SQRT_HALF))


def _mlp_kernel(x_ref, lnsb_ref, w1_ref, b1_ref, w2_ref, b2_ref, rs_ref,
                o_ref, *, hidden_chunk, eps):
    x = x_ref[:, :]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * lnsb_ref[0:1, :] + lnsb_ref[1:2, :]
    xn = xn.astype(x.dtype)

    H = w1_ref.shape[1]
    acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    for c0 in range(0, H, hidden_chunk):
        h = jax.lax.dot_general(
            xn, w1_ref[:, c0 : c0 + hidden_chunk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0:1, c0 : c0 + hidden_chunk]
        h = _gelu_exact(h).astype(x.dtype)
        acc = acc + jax.lax.dot_general(
            h, w2_ref[c0 : c0 + hidden_chunk, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:, :] = (
        xf + rs_ref[:, 0:1] * (acc + b2_ref[0:1, :].astype(jnp.float32))
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "hidden_chunk", "interpret")
)
def fused_swin_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    row_scale: jnp.ndarray | None = None,
    block_rows: int = 1024,
    hidden_chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (..., M, C) tokens; returns x + s * fc2(gelu(fc1(LN(x)))).

    Weights: w1 (C, Hd), w2 (Hd, C); LN eps 1e-5 (Swin convention).
    `row_scale` (optional, (M,) after flattening leading dims) scales the
    MLP BRANCH per row before the residual add — this is how drop_path
    (0 or 1/keep per sample, broadcast over its tokens) enters the fused
    path in training; None means 1.
    """
    orig_shape = x.shape
    C = x.shape[-1]
    Hd = w1.shape[1]
    xr = x.reshape(-1, C)
    M = xr.shape[0]
    rs = (
        jnp.ones((M, 1), jnp.float32) if row_scale is None
        else row_scale.reshape(M, 1).astype(jnp.float32)
    )
    pad = (-M) % block_rows
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        rs = jnp.pad(rs, ((0, pad), (0, 0)))
    lnsb = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    hc = min(hidden_chunk, Hd)

    kernel = functools.partial(_mlp_kernel, hidden_chunk=hc, eps=1e-5)
    out = pl.pallas_call(
        kernel,
        grid=((M + pad) // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + pad, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xr, lnsb, w1, b1[None, :], w2, b2[None, :], rs)
    if pad:
        out = out[:M]
    return out.reshape(orig_shape)


def _gelu_grad(z):
    """d/dz gelu(z) = Phi(z) + z * phi(z), with Phi via the same erf
    approximation as the forward (so fwd/bwd use one consistent GELU)."""
    phi = jnp.exp(-0.5 * z * z) * 0.3989422804014327
    return 0.5 * (1.0 + _erf(z * _SQRT_HALF)) + z * phi


def _mlp_bwd_kernel(x_ref, lnsb_ref, w1_ref, b1_ref, w2_ref, b2_ref, do_ref,
                    rs_ref,
                    dx_ref, dlnsb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                    hidden_chunk, eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dlnsb_ref[:, :] = jnp.zeros_like(dlnsb_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)

    x = x_ref[:, :]
    # residual cotangent is the RAW do; the branch sees do * row_scale
    do_res = do_ref[:, :].astype(jnp.float32)
    do = do_res * rs_ref[:, 0:1]
    xf = x.astype(jnp.float32)
    C = x.shape[1]

    # recompute LN
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    gamma = lnsb_ref[0:1, :]
    xn = (xhat * gamma + lnsb_ref[1:2, :]).astype(x.dtype)

    dob = do.astype(x.dtype)
    H = w1_ref.shape[1]
    dn = jnp.zeros((x.shape[0], C), jnp.float32)
    for c0 in range(0, H, hidden_chunk):
        sl = slice(c0, c0 + hidden_chunk)
        # recompute the hidden chunk
        hpre = jax.lax.dot_general(
            xn, w1_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0:1, sl]
        h = _gelu_exact(hpre).astype(x.dtype)
        # dW2_c += h^T do ; db2 handled once below
        dw2_ref[sl, :] += jax.lax.dot_general(
            h, dob,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dh_c = do W2_c^T ; dhpre_c = dh_c * gelu'(hpre)
        dh = jax.lax.dot_general(
            dob, w2_ref[sl, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dhpre = dh * _gelu_grad(hpre)
        db1_ref[0:1, sl] += jnp.sum(dhpre, axis=0, keepdims=True)
        dhpre_b = dhpre.astype(x.dtype)
        dw1_ref[:, sl] += jax.lax.dot_general(
            xn, dhpre_b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dn = dn + jax.lax.dot_general(
            dhpre_b, w1_ref[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    db2_ref[0:1, :] += jnp.sum(do, axis=0, keepdims=True)

    # LN affine + input backward
    dlnsb_ref[0:1, :] += jnp.sum(dn * xhat, axis=0, keepdims=True)
    dlnsb_ref[1:2, :] += jnp.sum(dn, axis=0, keepdims=True)
    dxhat = dn * gamma
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:, :] = (do_res + dx_ln).astype(dx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "hidden_chunk", "interpret")
)
def _fused_swin_mlp_bwd_call(
    x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale, do,
    block_rows=1024, hidden_chunk=512, interpret=False,
):
    C = x.shape[-1]
    Hd = w1.shape[1]
    # the backward's kernel stack scales ~ block_rows * Hd * 16 B (the
    # unrolled hidden-chunk loop's f32 temporaries are not fully reused by
    # Mosaic), so clamp rows by the hidden width to keep the stack ~16 MB:
    # stage 3 (Hd=4096) at the caller's 2048 rows needs >100 MB and fails
    # scoped-vmem allocation. 2^20 elements -> 2048/1024/512/256 rows for
    # the four Swin stages.
    block_rows = min(block_rows, max(256, (1 << 20) // Hd))
    xr = x.reshape(-1, C)
    dor = do.reshape(-1, C)
    M = xr.shape[0]
    rs = (
        jnp.ones((M, 1), jnp.float32) if row_scale is None
        else row_scale.reshape(M, 1).astype(jnp.float32)
    )
    pad = (-M) % block_rows
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        # padded cotangent rows are zero -> zero accumulation contributions
        dor = jnp.pad(dor, ((0, pad), (0, 0)))
        rs = jnp.pad(rs, ((0, pad), (0, 0)))
    lnsb = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)
    hc = min(hidden_chunk, Hd)

    kernel = functools.partial(_mlp_bwd_kernel, hidden_chunk=hc, eps=1e-5)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    dx, dlnsb, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid=((M + pad) // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, C), row, memory_space=pltpu.VMEM),
            # accumulated across sequential grid steps (same block each i)
            pl.BlockSpec((2, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M + pad, C), x.dtype),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
            jax.ShapeDtypeStruct((C, Hd), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, lnsb, w1, b1[None, :], w2, b2[None, :], dor, rs)
    if pad:
        dx = dx[:M]
    return (
        dx.reshape(x.shape),
        dlnsb[0].astype(ln_scale.dtype),
        dlnsb[1].astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_swin_mlp_vjp(
    x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale=None,
    block_rows=1024, hidden_chunk=512, interpret=False,
):
    """`fused_swin_mlp` with a recompute-in-VMEM backward (training path).

    `row_scale` (the drop_path branch mask) is a random regularizer input
    and receives a zero cotangent.
    """
    return fused_swin_mlp(
        x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale,
        block_rows, hidden_chunk, interpret,
    )


def _fsm_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale,
             block_rows, hidden_chunk, interpret):
    out = fused_swin_mlp(
        x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale,
        block_rows, hidden_chunk, interpret,
    )
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale)


def _fsm_bwd(block_rows, hidden_chunk, interpret, res, do):
    x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale = res
    grads = _fused_swin_mlp_bwd_call(
        x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale, do,
        block_rows, hidden_chunk, interpret,
    )
    drs = None if row_scale is None else jnp.zeros_like(row_scale)
    return grads + (drs,)


fused_swin_mlp_vjp.defvjp(_fsm_fwd, _fsm_bwd)
