"""BEVStereoOCC: the plain occupancy baseline (no world-model heads).

Parity: `BEVStereo4DOCC` with `use_predicter=True`
(`mmdet3d/models/detectors/bevdet_occ.py:46-325`, base config
`configs/preworld/nuscenes/bevstereo-occ.py`): final_conv -> predicter MLP
-> 18-class CE + LSS depth loss; test = softmax argmax. Shares the entire
feature extractor with `PreWorld`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .layers import MlpSequence
from .preworld import PreWorld
from .view_transformer import depth_bce_loss


class BEVStereoOCC(PreWorld):
    def setup(self):
        super().setup()
        c = self.cfg
        self.predicter = MlpSequence(
            c.out_dim * 2, c.num_classes, dtype=jnp.float32, name="predicter"
        )

    def occ_logits(self, batch, train: bool = False):
        voxel_feats, depth = self.extract_voxel_feat(batch, train=train)
        return self.predicter(voxel_feats), depth

    def loss(self, batch, train: bool = True) -> Dict[str, jnp.ndarray]:
        """CE occupancy loss + LSS depth BCE (`bevdet_occ.py:271-325`;
        depth weight 0.05 from `bevstereo-occ.py:84`)."""
        c = self.cfg
        logits, depth = self.occ_logits(batch, train=train)
        target = batch["voxel_semantics"].astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        losses = {"loss_occ": ce.mean()}
        losses["loss_depth"] = depth_bce_loss(
            depth, batch["gt_depth"], self.view_transformer.downsample,
            c.grid, weight=c.depth_loss_weight,
        )
        return losses

    def predict(self, batch) -> Dict[str, jnp.ndarray]:
        logits, _ = self.occ_logits(batch, train=False)
        occ = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return {"semantic_occ": occ}

    def __call__(self, batch, train: bool = False):
        if "voxel_semantics" in batch:
            return self.loss(batch, train=train)
        return self.predict(batch)
