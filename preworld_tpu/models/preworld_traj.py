"""PreWorld4DTraj: state-conditioned 4-D occupancy forecasting + ego traj.

Parity: `mmdet3d/models/detectors/preworld_temporal_traj.py:27-530`.
The recursive rollout (`:451-528`) — fuse current ego kinematics into the
voxel features, re-predict occupancy/attributes/trajectory, feed the fused
features forward — is an unrolled weight-shared loop over `num_future`
steps; the epoch curriculum (`:440-449`) selects `num_future`, which is a
static argument (at most 6 distinct compiles per run).

Extra batch keys (see the 4-D dataset adapter):
  ego_states         (B, 21)       current ego kinematics (AD-MLP format)
  temporal_semantics (B, 6, X, Y, Z)  future occupancy GT
  temporal_rays      (B, 6, R, 16)    future ray supervision (pretrain)
  temporal_trajs     (B, 6, 2)        future ego waypoints
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ..losses import (
    ce_ssc_loss,
    distance_weighted_focal_loss,
    geo_scal_loss,
    lovasz_softmax_loss,
    sem_scal_loss,
)
from .layers import MlpSequence
from .nerf_head import nerf_head_losses, voxel_class_weights
from .occ_head import DownScale3D
from .preworld import PreWorld


class PlanHead(nn.Module):
    """Ego-state MLP 21 -> 256 -> 256 -> out_dim (`:119-127`), ReLU."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(256, name="fc1")(x))
        x = nn.relu(nn.Dense(256, name="fc2")(x))
        return nn.Dense(self.out_dim, name="fc3")(x)


class EgoFusionHead(nn.Module):
    """5C -> 8C -> 4C -> 2C -> C with Softplus (`:136-144`)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        for i, mult in enumerate((8, 4, 2)):
            x = nn.softplus(nn.Dense(self.out_dim * mult, name=f"fc{i}")(x))
        return nn.Dense(self.out_dim, name="fc3")(x)


def rollout_curriculum(epoch: int, if_render: bool) -> int:
    """Number of future rollout steps for this epoch
    (`preworld_temporal_traj.py:440-449`)."""
    if if_render:
        return 2 if epoch <= 2 else min(epoch - 1, 6)
    return 2 if epoch <= 4 else min((epoch - 3) // 2 + 1, 6)


def l2_traj_loss(pred, gt):
    """sum over coords of batch-mean squared error (`loss.py:125-131`)."""
    return ((pred - gt) ** 2).mean(axis=0).sum()


class PreWorld4DTraj(PreWorld):
    def setup(self):
        super().setup()
        c = self.cfg
        self.plan_head = PlanHead(c.out_dim, name="plan_head")
        self.fusion_head = MlpSequence(
            c.out_dim * 4, c.out_dim, name="fusion_head"
        )
        self.downscale = DownScale3D(c.out_dim, name="downscale")
        self.ego_fusion_head = EgoFusionHead(c.out_dim, name="ego_fusion_head")
        self.traj_head = MlpSequence(c.out_dim * 2, 2, name="traj_head")

    # ------------------------------------------------------------------
    def rollout_step(self, voxel_feats, ego_states):
        """One recursive future step (`:451-470`).

        Returns (fused_voxel_feats, pred_traj)."""
        B, X, Y, Z, C = voxel_feats.shape
        ego_feats = self.plan_head(ego_states)  # (B, C)
        identity = ego_feats
        grid_ego = jnp.broadcast_to(
            ego_feats[:, None, None, None, :], (B, X, Y, Z, C)
        )
        fused = self.fusion_head(
            jnp.concatenate([voxel_feats, grid_ego], axis=-1)
        )
        fused = fused + voxel_feats  # residual (`:462`)

        down = self.downscale(fused)  # (B, 4C)
        upd = jnp.concatenate([identity, down], axis=-1)  # (B, 5C)
        fused_ego = identity + self.ego_fusion_head(upd)
        pred_traj = self.traj_head(fused_ego)
        return fused, pred_traj

    # ------------------------------------------------------------------
    def _voxel_losses(self, occ_logits, target, suffix):
        c = self.cfg
        cls_w = jnp.asarray(
            voxel_class_weights(c.num_classes, c.balance_cls_weight)
        )
        out = {}
        if c.use_focal_loss:
            out["loss_voxel_ce" + suffix] = (
                c.weight_voxel_ce
                * distance_weighted_focal_loss(occ_logits, target, cls_w)
            )
        else:
            out["loss_voxel_ce" + suffix] = c.weight_voxel_ce * ce_ssc_loss(
                occ_logits, target, cls_w
            )
        out["loss_voxel_sem" + suffix] = c.weight_voxel_sem_scal * sem_scal_loss(
            occ_logits, target
        )
        out["loss_voxel_geo" + suffix] = c.weight_voxel_geo_scal * geo_scal_loss(
            occ_logits, target, non_empty_idx=c.empty_idx
        )
        out["loss_voxel_lovasz" + suffix] = (
            c.weight_voxel_lovasz
            * lovasz_softmax_loss(occ_logits, target, ignore_index=c.empty_idx)
        )
        return out

    def _future_step_losses(
        self, voxel_feats, ego_states, tgt, traj_gt, rays, bda, train,
        mesh=None,
    ):
        """One rollout step + its losses, un-suffixed. Factored out so the
        whole step can be rematerialized: the unrolled flagship rollout
        otherwise keeps each step's fused voxel grid, occ logits and loss
        workspaces live for backward and exhausts HBM."""
        c = self.cfg
        voxel_feats, pred_traj = self.rollout_step(voxel_feats, ego_states)
        terms: Dict[str, jnp.ndarray] = {}
        if c.if_post_finetune:
            occ_logits = self.occupancy_logits(voxel_feats, train=train)
            terms.update(self._voxel_losses(occ_logits, tgt, ""))
        if c.if_render:
            density, semantic, color = self.predict_attributes(voxel_feats)
            terms.update(
                nerf_head_losses(
                    density, semantic, color, rays, bda, c.nerf, suffix="",
                    mesh=mesh,
                )
            )
        terms["loss_traj"] = l2_traj_loss(pred_traj, traj_gt)
        return voxel_feats, terms

    def loss(self, batch, train: bool = True, num_future: int = 2,
             mesh=None):
        """Rollout training losses (`forward_train`, `:372-530`)."""
        c = self.cfg
        voxel_feats, depth = self.extract_voxel_feat(batch, train=train)
        losses: Dict[str, jnp.ndarray] = {}

        from .view_transformer import depth_bce_loss

        if c.use_lss_depth_loss:
            losses["loss_lss_depth"] = depth_bce_loss(
                depth, batch["gt_depth"], self.view_transformer.downsample,
                c.grid, weight=c.depth_loss_weight,
            )

        target0 = batch["voxel_semantics"].astype(jnp.int32)
        if c.if_post_finetune:
            occ_logits = self.occupancy_logits(voxel_feats, train=train)
            losses.update(self._voxel_losses(occ_logits, target0, "_0s"))
        if c.if_render:
            density, semantic, color = self.predict_attributes(voxel_feats)
            losses.update(
                nerf_head_losses(
                    density, semantic, color, batch["rays"], batch["bda"],
                    c.nerf, suffix="_0s", mesh=mesh,
                )
            )

        step_fn = (
            nn.remat(
                PreWorld4DTraj._future_step_losses, static_argnums=(7, 8)
            )
            if c.remat else PreWorld4DTraj._future_step_losses
        )
        ego_states = batch["ego_states"]
        for step in range(num_future):
            future = step + 1
            tgt = (
                batch["temporal_semantics"][:, future - 1].astype(jnp.int32)
                if c.if_post_finetune else None
            )
            rays = (
                batch["temporal_rays"][:, future - 1] if c.if_render else None
            )
            voxel_feats, terms = step_fn(
                self, voxel_feats, ego_states, tgt,
                batch["temporal_trajs"][:, future - 1], rays, batch["bda"],
                train, mesh,
            )
            losses.update({k + f"_{future}s": v for k, v in terms.items()})
        return losses

    # ------------------------------------------------------------------
    def predict(self, batch, num_future: int = 6) -> Dict[str, jnp.ndarray]:
        """Rollout inference (`simple_test`, `:212-370`): occupancy at the
        current frame plus `num_future` recursive future steps."""
        c = self.cfg
        voxel_feats, _ = self.extract_voxel_feat(batch, train=False)

        def occ_of(feats):
            if not c.if_post_finetune:
                density, semantic, _ = self.predict_attributes(feats)
                occupied = density > c.test_threshold
                sem = jnp.argmax(semantic, axis=-1)
                return jnp.where(occupied, sem, c.num_classes - 1).astype(
                    jnp.int32
                )
            logits = self.occupancy_logits(feats, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        out = {"semantic_occ_0s": occ_of(voxel_feats)}
        ego_states = batch["ego_states"]
        for step in range(num_future):
            voxel_feats, _ = self.rollout_step(voxel_feats, ego_states)
            out[f"semantic_occ_{step + 1}s"] = occ_of(voxel_feats)
        return out

    def __call__(self, batch, train: bool = False, num_future: int = 2,
                 mesh=None):
        if "temporal_trajs" in batch:
            return self.loss(
                batch, train=train, num_future=num_future, mesh=mesh
            )
        if "ego_states" in batch:
            return self.predict(batch)
        return super().predict(batch)
