"""Occupancy prediction head (FB-BEV style).

Parity: `mmdet3d/models/heads/occupancy_head.py:46-177` with the PreWorld
config (`preworld-7frame-pretrain.py:35-47`): num_level=1, soft_weights=True,
no deblock. Channel-last on (B, X, Y, Z, C).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvNormAct


class OccHead(nn.Module):
    in_channels: int = 32
    out_channel: int = 18
    soft_weights: bool = True
    norm: str = "bn"  # config uses SyncBN == plain BN under pjit SPMD
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats, train: bool = False):
        """voxel_feats: (B, X, Y, Z, C) -> logits (B, X, Y, Z, out_channel)."""
        mid = self.in_channels // 2
        x = ConvNormAct(
            mid, (3, 3, 3), norm=self.norm, dtype=self.dtype, name="occ_conv"
        )(voxel_feats, train)

        # soft multi-scale fusion collapses to a learned scalar gate at
        # num_level=1 (`occupancy_head.py:142-152`); keep it for checkpoint
        # parity and for future multi-level use.
        if self.soft_weights:
            w = ConvNormAct(
                mid // 2, (1, 1, 1), norm=self.norm, dtype=self.dtype,
                name="soft_w0",
            )(x, train)
            w = nn.Conv(1, (1, 1, 1), use_bias=False, dtype=self.dtype,
                        name="soft_w1")(w)
            w = nn.softmax(w, axis=-1)  # single level -> all ones
            x = x * w

        y = ConvNormAct(
            mid // 2, (1, 1, 1), norm=self.norm, dtype=self.dtype, name="pred0"
        )(x, train)
        return nn.Conv(
            self.out_channel, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="pred1",
        )(y)


class DownScale3D(nn.Module):
    """8x conv3d downscale + global average pool
    (`occupancy_head.py:180-200`), used by the forecasting ego fusion."""

    in_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """feats: (B, X, Y, Z, C) -> (B, 4*C)."""
        x = nn.Conv(self.in_dim * 2, (2, 2, 2), strides=(2, 2, 2),
                    dtype=self.dtype, name="down1")(feats)
        x = nn.Conv(self.in_dim * 4, (2, 2, 2), strides=(2, 2, 2),
                    dtype=self.dtype, name="down2")(x)
        x = nn.Conv(self.in_dim * 4, (2, 2, 2), strides=(2, 2, 2),
                    dtype=self.dtype, name="down3")(x)
        return jnp.mean(x, axis=(1, 2, 3))
