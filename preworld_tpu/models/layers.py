"""Shared flax.linen building blocks (channel-last, TPU-native).

Counterparts of the mmcv bricks used by the reference: ConvModule
(conv+norm+act), BasicBlock 2D/3D, Mlp, SELayer. All tensors are NHWC /
NDHWC — the layout XLA prefers on TPU — instead of torch's NCHW.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv3d import conv3d_zfold

Dtype = Any




class ConvNormAct(nn.Module):
    """Conv(+BN/GN)(+act) in channel-last layout; N-d via kernel_size rank.

    Equivalent of mmcv `ConvModule` as used across the reference models.
    """

    features: int
    kernel_size: Union[int, Tuple[int, ...]]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[str, int] = "SAME"
    dilation: Union[int, Tuple[int, ...]] = 1
    use_bias: bool = False
    norm: Optional[str] = "bn"  # 'bn' | 'gn' | None
    gn_groups: int = 32
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = (
            len(self.kernel_size)
            if isinstance(self.kernel_size, (tuple, list))
            else x.ndim - 2
        )
        ks = (
            tuple(self.kernel_size)
            if isinstance(self.kernel_size, (tuple, list))
            else (self.kernel_size,) * ndim
        )
        st = (
            tuple(self.strides)
            if isinstance(self.strides, (tuple, list))
            else (self.strides,) * ndim
        )
        dl = (
            tuple(self.dilation)
            if isinstance(self.dilation, (tuple, list))
            else (self.dilation,) * ndim
        )
        if isinstance(self.padding, str):
            # torch Conv pads symmetrically by dilation*(k-1)//2; XLA 'SAME'
            # only matches that for stride 1 (it right-pads under stride>1),
            # so spell the torch padding out explicitly.
            pad = [
                (dl[i] * (ks[i] - 1) // 2, dl[i] * (ks[i] - 1) // 2)
                for i in range(ndim)
            ]
        else:
            pad = [(self.padding, self.padding)] * ndim
        conv = nn.Conv(
            self.features,
            ks,
            strides=st,
            padding=pad,
            kernel_dilation=dl,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )
        # 3-D convs with a small channel-adjacent spatial axis reformulate
        # as block-banded 2-D convs (see conv3d_zfold: XLA's conv3d
        # lowering on the (B, X, Y, Z, C) heads layout im2cols ~k^3 copies
        # into HBM). ONLY that axis: transposing (B, Z, Y, X, C) BEV
        # tensors to fold their leading Z measured WORSE (8.7 -> 11.5 GB)
        # — that layout doesn't hit the pathological case. Gate on the
        # banded weight staying small. Param tree is nn.Conv's own (dummy
        # call creates it; XLA DCEs the result).
        fold_axis = None
        if ndim == 3 and ks[2] > 1:
            Z = x.shape[3]
            Zo = (Z + pad[2][0] + pad[2][1] - dl[2] * (ks[2] - 1) - 1) \
                // st[2] + 1
            wbytes = ks[0] * ks[1] * Z * x.shape[-1] * Zo * self.features * 4
            if Zo >= 1 and wbytes <= 128 * 1024 * 1024:
                fold_axis = 2
        if fold_axis is not None:
            _ = conv(jnp.zeros((1, 1, 1, 1, x.shape[-1]), x.dtype))
            p = conv.variables["params"]
            x = conv3d_zfold(
                x,
                p["kernel"].astype(self.dtype),
                p["bias"].astype(self.dtype) if self.use_bias else None,
                st, pad, dl,
            )
        else:
            x = conv(x)
        if self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        elif self.norm == "gn":
            x = nn.GroupNorm(num_groups=self.gn_groups, epsilon=1e-5, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock(nn.Module):
    """torchvision/mmdet BasicBlock (2 convs + residual), N-d by input rank.

    Parity: `mmdet.models.backbones.resnet.BasicBlock` (2D) and the
    reference's `BasicBlock3D` (`mmdet3d/models/backbones/resnet.py:88-123`),
    which differ only in conv rank and the downsample projection.
    """

    features: int
    strides: int = 1
    downsample: bool = False
    downsample_kernel: int = 3  # reference 3D blocks use 3x3x3 projections
    downsample_norm: bool = True  # DepthNet uses a bare 1x1 conv projection
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        if self.downsample:
            identity = ConvNormAct(
                self.features,
                self.downsample_kernel,
                strides=self.strides,
                norm="bn" if self.downsample_norm else None,
                act=None,
                use_bias=not self.downsample_norm,
                dtype=self.dtype,
                name="downsample",
            )(x, train)
        y = ConvNormAct(
            self.features, 3, strides=self.strides, dtype=self.dtype, name="conv1"
        )(x, train)
        y = ConvNormAct(
            self.features, 3, act=None, dtype=self.dtype, name="conv2"
        )(y, train)
        return nn.relu(y + identity)


class Mlp(nn.Module):
    """fc -> act -> fc (`view_transformer.py:429-452`)."""

    hidden: int
    out: int
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = self.act(x)
        return nn.Dense(self.out, dtype=self.dtype)(x)


class SELayer(nn.Module):
    """Channel gating by an external embedding (`view_transformer.py:455-468`)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_se):
        # x: (..., H, W, C); x_se: (batch, C) broadcast over spatial dims
        g = nn.Dense(self.channels, use_bias=True, dtype=self.dtype)(x_se)
        g = nn.relu(g)
        g = nn.Dense(self.channels, use_bias=True, dtype=self.dtype)(g)
        g = nn.sigmoid(g)
        return x * g[:, None, None, :]


class MlpSequence(nn.Module):
    """Linear->Softplus->Linear(->Softplus) used by the attribute heads
    (`preworld.py:81-105`)."""

    hidden: int
    out: int
    final_softplus: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.softplus(x)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        if self.final_softplus:
            x = nn.softplus(x)
        return x


def _interp_axis(x: jnp.ndarray, out_size: int, axis: int, align_corners: bool):
    """1-D linear interpolation along `axis` (torch Upsample parity)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if align_corners:
        coords = jnp.linspace(0.0, in_size - 1.0, out_size)
    else:
        scale = in_size / out_size
        coords = jnp.clip((jnp.arange(out_size) + 0.5) * scale - 0.5, 0, in_size - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (coords - lo).astype(x.dtype)
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return xl * (1 - w) + xh * w


def upsample(
    x: jnp.ndarray,
    scale: Union[int, Sequence[int]],
    align_corners: bool = True,
) -> jnp.ndarray:
    """Channel-last bilinear/trilinear upsample matching torch
    `nn.Upsample(mode='bilinear'/'trilinear', align_corners=...)` exactly
    (used by FPN_LSS / LSSFPN3D, `lss_fpn.py:26-27,111-118`)."""
    if isinstance(scale, int):
        scale = (scale,) * (x.ndim - 2)
    for i, f in enumerate(scale):
        x = _interp_axis(x, int(x.shape[1 + i] * f), 1 + i, align_corners)
    return x


def interpolate_to(
    x: jnp.ndarray, sizes: Sequence[int], align_corners: bool = False
) -> jnp.ndarray:
    """Resize channel-last spatial dims to `sizes` (torch F.interpolate)."""
    for i, s in enumerate(sizes):
        x = _interp_axis(x, int(s), 1 + i, align_corners)
    return x
