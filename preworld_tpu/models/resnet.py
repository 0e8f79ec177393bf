"""CustomResNet (2D BEV encoder) and CustomResNet3D (voxel encoder).

Parity: `mmdet3d/models/backbones/resnet.py:12-184`. Channel-last; the 3D
variant is the reference's voxel bev-encoder backbone and the `pre_process`
net (config `bevstereo-occ.py:90-108`).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BasicBlock


class CustomResNet(nn.Module):
    """Stacked BasicBlock stages; returns features of the requested stages."""

    num_layer: Sequence[int] = (2, 2, 2)
    num_channels: Sequence[int] = (160, 320, 640)
    stride: Sequence[int] = (2, 2, 2)
    backbone_output_ids: Sequence[int] = (0, 1, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        feats = []
        for i, (n, c, s) in enumerate(
            zip(self.num_layer, self.num_channels, self.stride)
        ):
            x = BasicBlock(
                c, strides=s, downsample=True, dtype=self.dtype,
                name=f"layer{i}_block0",
            )(x, train)
            for j in range(1, n):
                x = BasicBlock(c, dtype=self.dtype, name=f"layer{i}_block{j}")(
                    x, train
                )
            if i in self.backbone_output_ids:
                feats.append(x)
        return tuple(feats)


# The reference's 2D and 3D CustomResNets are structurally identical modulo
# conv rank; with channel-last convs + rank-by-input our BasicBlock covers
# both, so CustomResNet3D is the same module applied to NDHWC input.
CustomResNet3D = CustomResNet
