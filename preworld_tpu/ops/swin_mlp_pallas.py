"""Fused Swin MLP sub-block (Pallas, TPU): out = x + fc2(gelu(fc1(LN(x)))).

The XLA path materializes the 4C-wide hidden activation in HBM twice
(fc1 write + fc2 read) — ~550 MB per flagship Swin block, the largest
single term in the backbone's HBM traffic (encode ~82 GB of a 176 GB
forward). This kernel streams row tiles through LN -> fc1 -> exact GELU ->
fc2 -> +residual entirely in VMEM: per block it reads x once and writes
the output once (plus the weights, resident across grid steps).

Reference semantics: `swin.py` FFN (LN eps 1e-5, exact erf GELU, bias on
both fcs) — see models/swin.py::SwinBlock. Inference-only (no VJP);
training keeps the XLA path.
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


def _mlp_kernel(x_ref, lnsb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                hidden_chunk, eps):
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
        xf + acc + b2_ref[0:1, :].astype(jnp.float32)
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
    block_rows: int = 1024,
    hidden_chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (..., M, C) tokens; returns x + fc2(gelu(fc1(LN(x)))).

    Weights: w1 (C, Hd), w2 (Hd, C); LN eps 1e-5 (Swin convention).
    """
    orig_shape = x.shape
    C = x.shape[-1]
    Hd = w1.shape[1]
    xr = x.reshape(-1, C)
    M = xr.shape[0]
    pad = (-M) % block_rows
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
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
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + pad, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xr, lnsb, w1, b1[None, :], w2, b2[None, :])
    if pad:
        out = out[:M]
    return out.reshape(orig_shape)
