"""3-D convolution as a block-z-banded 2-D convolution (TPU).

XLA's TPU conv3d lowering materializes ~k^3 im2col patch copies in HBM
(measured r5: 2.57 GB for ONE 3x3x3 conv on a (1,200,200,16,32) f32 grid —
31x the input bytes; the occupancy heads and the render backward's corner
fold were made of this). Folding the channel-adjacent spatial axis (Z, C)
into the channel dim turns the same math into a 2-D conv the MXU path
handles natively. Used by models.layers.ConvNormAct (3-D convs) and
ops.field_sample (the corner-table fold).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv3d_zfold(x, kernel, bias, strides, padding, dilation):
    """3-D convolution as a block-z-banded 2-D convolution.

    XLA's TPU conv3d lowering materializes ~k^3 im2col patch copies in HBM
    (measured r5: 2.57 GB for ONE 3x3x3 conv on a (1,200,200,16,32) f32
    grid — 31x the input bytes; the heads/BEV-encoder stages were made of
    this). Folding (Z, C) into the channel dim turns the same math into a
    2-D conv the MXU path handles natively: output channel block zo takes
    input blocks zi = zo*sz + t*dz - pz only, via a banded weight built
    from the ORIGINAL (kx, ky, kz, Ci, Co) kernel — identical sums plus
    exact-zero taps, so results match conv3d bit-for-bit up to reduction
    order. Out-of-range z taps simply have zero bands (no physical pad).

    Args:
      x: (B, X, Y, Z, Ci); kernel: (kx, ky, kz, Ci, Co); bias: (Co,)|None.
      strides/dilation: length-3 tuples; padding: [(lo,hi)] * 3.
    Returns: (B, Xo, Yo, Zo, Co).
    """
    import numpy as np

    B, X, Y, Z, Ci = x.shape
    kx, ky, kz, _, Co = kernel.shape
    sx, sy, sz = strides
    dx, dy, dz = dilation
    pz = padding[2]
    Zo = (Z + pz[0] + pz[1] - dz * (kz - 1) - 1) // sz + 1
    # (kz, Z, Zo) 0/1 band selector (trace-time constant)
    M = np.zeros((kz, Z, Zo), np.float32)
    for zo in range(Zo):
        for t in range(kz):
            zi = zo * sz + t * dz - pz[0]
            if 0 <= zi < Z:
                M[t, zi, zo] = 1.0
    W2 = jnp.einsum(
        "xytic,tzw->xyziwc", kernel, jnp.asarray(M, kernel.dtype)
    ).reshape(kx, ky, Z * Ci, Zo * Co)
    y = jax.lax.conv_general_dilated(
        x.reshape(B, X, Y, Z * Ci),
        W2,
        window_strides=(sx, sy),
        padding=[tuple(padding[0]), tuple(padding[1])],
        rhs_dilation=(dx, dy),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(*y.shape[:3], Zo, Co)
    if bias is not None:
        y = y + bias
    return y
