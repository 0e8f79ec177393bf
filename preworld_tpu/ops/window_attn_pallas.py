"""Fused window attention (Pallas, TPU) for the Swin backbone.

The XLA window-attention path materializes the (nW*B, h, N, N) score
tensor in HBM three times over (QK^T out, +bias/+mask, softmax) — ~2 GB of
traffic per stage-0 block at flagship scale, which is what makes Swin
HBM-bound here (swin FLOPs alone are ~3 ms/forward; measured ~100 ms).
This kernel keeps one window-block's scores in VMEM/registers through
QK^T -> +relative-position bias -> +shift mask -> softmax -> @V, writing
only the (N, d) outputs.

Scope: inference only (no VJP — training keeps the XLA path, whose
backward XLA already schedules reasonably; the fps headline is inference).
Semantics oracled against `WindowMSA`'s math in tests/test_ops.py.

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
        interpret=interpret,
    )(
        qkv.reshape(Bn * N, C3),
        bias.reshape(heads * N, N).astype(jnp.float32),
        mask.reshape(nW * N, N).astype(jnp.float32),
    )
    return out.reshape(Bn, N, C)
