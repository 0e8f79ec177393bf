"""Image neck FPN_LSS and voxel neck LSSFPN3D.

Parity: `mmdet3d/models/necks/lss_fpn.py:13-148`. Channel-last.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvNormAct, upsample


class FPN_LSS(nn.Module):
    """Upsample deep stage, concat with shallow stage, fuse with 2 convs.

    Config parity (`bevstereo-occ.py:68-75`): in 512+1024, out 512,
    scale_factor=2, extra_upsample=None, input_feature_index=(0, 1).
    """

    out_channels: int
    scale_factor: int = 2
    input_feature_index: Sequence[int] = (0, 1)
    extra_upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x2 = feats[self.input_feature_index[0]]
        x1 = feats[self.input_feature_index[1]]
        x1 = upsample(x1, self.scale_factor, align_corners=True)
        x = jnp.concatenate([x2, x1], axis=-1)
        c = self.out_channels * (2 if self.extra_upsample else 1)
        x = ConvNormAct(c, 3, dtype=self.dtype, name="conv0")(x, train)
        x = ConvNormAct(c, 3, dtype=self.dtype, name="conv1")(x, train)
        if self.extra_upsample:
            x = upsample(x, 2, align_corners=True)
            x = ConvNormAct(
                self.out_channels, 3, dtype=self.dtype, name="up_conv"
            )(x, train)
            x = nn.Conv(
                self.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
                name="up_proj",
            )(x)
        return x


class LSSFPN3D(nn.Module):
    """Trilinear-upsample 3 voxel scales, concat, 1x1x1 fuse to out_channels.

    Parity: `lss_fpn.py:104-148` (levels=3); input feats at 1x, 1/2, 1/4.
    """

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x8, x16, x32 = feats
        x16 = upsample(x16, 2, align_corners=True)
        x32 = upsample(x32, 4, align_corners=True)
        x = jnp.concatenate([x8, x16, x32], axis=-1)
        return ConvNormAct(
            self.out_channels, (1, 1, 1), dtype=self.dtype, name="fuse"
        )(x, train)
