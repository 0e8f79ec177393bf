"""LSS view transformer: image features -> 3D voxel features via lift-splat.

Parity: `mmdet3d/models/necks/view_transformer.py:16-319,702-813`
(LSSViewTransformer / BEVDepth / BEVStereo). The depth-softmax x context
outer product + voxel scatter runs through `preworld_tpu.ops.bev_pool`
(replacing the bev_pool_v2 CUDA extension); all shapes are static.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.frustum import (
    GridConfig,
    create_frustum,
    frustum_pixel_indices,
    frustum_to_lidar,
    voxel_indices,
)
from ..ops.bev_pool import bev_pool
from ..ops.bev_pool_pallas import bev_pool_fused
from .depthnet import (
    DepthNet,
    gen_stereo_grid,
    gen_stereo_homography,
    stereo_cost_volume,
    stereo_cost_volume_expanded,
    stereo_cost_volume_fused,
)


def compute_stereo_cost_volume(
    cv_frustum, cams, stereo, input_size, bias,
    use_fused=None, use_table=None,
):
    """Temporal-stereo depth cost volume (`view_transformer.py:576-604`).

    Module-free (pure geometry + feature math, no params) so callers can
    compute it OUTSIDE remat boundaries and pass it via
    `stereo["cost_volume"]`.
    """
    from ..ops.cost_volume_pallas import plane_sweep_supported

    if use_fused is None:
        use_fused = (
            jax.default_backend() == "tpu"
            and plane_sweep_supported(stereo["prev_feat"].shape)
        )
    if use_table is None:
        use_table = jax.default_backend() == "tpu"
    if use_fused:
        # fused kernel path: no (BN, D*H, W, 2) grid tensor at all — the
        # per-plane warp collapses to (BN, D, 3, 3) homographies evaluated
        # in-register (gen_stereo_homography docstring; this XLA-side
        # coordinate chain, not the kernel, dominated the stage's bytes)
        import flax.linen as nn

        from ..ops.cost_volume_pallas import plane_sweep_cost_hom

        hom = gen_stereo_homography(
            cv_frustum,
            stereo["k2s_sensor"],
            cams["intrin"],
            cams["post_rot"],
            cams["post_tran"],
            input_size,
        )
        cost = plane_sweep_cost_hom(
            stereo["prev_feat"], stereo["curr_feat"], hom, bias=float(bias)
        )
        return nn.softmax(-cost, axis=1).astype(stereo["curr_feat"].dtype)
    grid_w = gen_stereo_grid(
        cv_frustum,
        stereo["k2s_sensor"],
        cams["intrin"],
        cams["post_rot"],
        cams["post_tran"],
        input_size,
    )
    cv_fn = (
        stereo_cost_volume_expanded if use_table
        else stereo_cost_volume
    )
    return cv_fn(
        stereo["prev_feat"], stereo["curr_feat"], grid_w, bias=bias
    )


def get_mlp_input(sensor2ego, ego2global, intrin, post_rot, post_tran, bda):
    """27-dim camera conditioning vector (`view_transformer.py:713-734`)."""
    B, N = sensor2ego.shape[:2]
    bda_r = jnp.broadcast_to(bda[:, None], (B, N, 3, 3))
    feats = jnp.stack(
        [
            intrin[:, :, 0, 0],
            intrin[:, :, 1, 1],
            intrin[:, :, 0, 2],
            intrin[:, :, 1, 2],
            post_rot[:, :, 0, 0],
            post_rot[:, :, 0, 1],
            post_tran[:, :, 0],
            post_rot[:, :, 1, 0],
            post_rot[:, :, 1, 1],
            post_tran[:, :, 1],
            bda_r[:, :, 0, 0],
            bda_r[:, :, 0, 1],
            bda_r[:, :, 1, 0],
            bda_r[:, :, 1, 1],
            bda_r[:, :, 2, 2],
        ],
        axis=-1,
    )
    s2e = sensor2ego[:, :, :3, :].reshape(B, N, 12)
    return jnp.concatenate([feats, s2e], axis=-1)


class LSSViewTransformer(nn.Module):
    """BEVStereo-style view transformer (stereo optional).

    __call__ args:
      x: (B, N, Hf, Wf, C_in) image features.
      cams: dict with sensor2keyego (B,N,4,4), intrin (B,N,3,3),
            post_rot (B,N,3,3), post_tran (B,N,3), bda (B,3,3),
            mlp_input (B,N,27).
      stereo: optional dict with prev_feat/curr_feat (B*N, Hc, Wc, C0) and
              k2s_sensor (B,N,4,4); None disables the cost volume
              (zero-cost-volume path, `view_transformer.py:621-628`).
    Returns:
      voxel feats (B, Z, Y, X, C_out), depth softmax (B, N, D, Hf, Wf).
    """

    grid: GridConfig
    input_size: Tuple[int, int]
    downsample: int = 16
    in_channels: int = 512
    out_channels: int = 32
    cv_downsample: int = 4
    stereo: bool = True
    cost_volume_bias: float = 5.0
    # NOTE: the depth-supervision weight lives in PreWorldConfig
    # (depth_loss_weight, consumed by the loss fns) — deliberately NOT
    # duplicated here
    aspp_mid_channels: int = 96
    use_pallas_pool: Optional[bool] = None  # None -> auto (TPU only)
    # fused Pallas plane-sweep cost volume (r3 TPU default; see
    # stereo_cost_volume_fused). None -> auto (TPU only).
    use_fused_cost_volume: Optional[bool] = None
    # corner-table (VMEM-resident gather) cost volume: the r2 path, kept as
    # an explicit opt-in fallback. Only consulted when the fused kernel is
    # disabled.
    use_table_cost_volume: Optional[bool] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.D = self.grid.num_depth_bins
        self.frustum = jnp.asarray(
            create_frustum(self.grid, self.input_size, self.downsample)
        )
        if self.stereo:
            self.cv_frustum = jnp.asarray(
                create_frustum(self.grid, self.input_size, self.cv_downsample)
            )
        self.depth_net = DepthNet(
            mid_channels=self.in_channels,
            context_channels=self.out_channels,
            depth_channels=self.D,
            aspp_mid_channels=self.aspp_mid_channels,
            stereo=self.stereo,
            cost_volume_bias=self.cost_volume_bias,
            dtype=self.dtype,
            name="depth_net",
        )

    def __call__(self, x, cams, stereo=None, train: bool = False,
                 pool_vox=None):
        """pool_vox: optional precomputed `voxel_indices` of the pooling
        frustum — the streaming path caches it across steps for fixed
        calibration (the reference `accelerate` cached-ranks analog,
        `view_transformer.py:155-174,263-296`)."""
        B, N, Hf, Wf, C = x.shape
        x = x.reshape(B * N, Hf, Wf, C)

        cost_volume = None
        if self.stereo:
            ch, cw = (
                self.input_size[0] // self.cv_downsample,
                self.input_size[1] // self.cv_downsample,
            )
            if stereo is None or (
                stereo.get("prev_feat") is None
                and stereo.get("cost_volume") is None
            ):
                cost_volume = jnp.zeros((B * N, self.D, ch, cw), self.dtype)
            elif stereo.get("cost_volume") is not None:
                # precomputed OUTSIDE this (possibly remat'd) module — under
                # jax.checkpoint an input is saved while in-module compute
                # would be re-executed in every backward despite carrying no
                # gradient (stop_gradient inputs); see preworld.py
                cost_volume = stereo["cost_volume"]
            else:
                cost_volume = compute_stereo_cost_volume(
                    self.cv_frustum, cams, stereo, self.input_size,
                    self.cost_volume_bias,
                    self.use_fused_cost_volume, self.use_table_cost_volume,
                )

        out = self.depth_net(
            x, cams["mlp_input"], cost_volume=cost_volume, train=train
        )
        depth_digit = out[..., : self.D]
        tran_feat = out[..., self.D : self.D + self.out_channels]
        depth = nn.softmax(depth_digit, axis=-1)  # (B*N, Hf, Wf, D)

        depth_bnd = depth.reshape(B, N, Hf, Wf, self.D).transpose(0, 1, 4, 2, 3)
        feat = tran_feat.reshape(B, N, Hf, Wf, self.out_channels)

        if pool_vox is None:
            coor = frustum_to_lidar(
                self.frustum,
                cams["sensor2keyego"],
                cams["intrin"],
                cams["post_rot"],
                cams["post_tran"],
                cams["bda"],
            )
            vox = voxel_indices(coor, self.grid)
        else:
            vox = pool_vox
        pix = jnp.asarray(frustum_pixel_indices(B, N, self.D, Hf, Wf))
        nvox = B * self.grid.num_voxels
        use_pallas = self.use_pallas_pool
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            pooled = bev_pool_fused(depth_bnd, feat, vox, pix, nvox)
        else:
            pooled = bev_pool(depth_bnd, feat, vox, pix, nvox)
        sx, sy, sz = (int(v) for v in self.grid.size)
        voxel_feat = pooled.reshape(B, sz, sy, sx, self.out_channels)
        return voxel_feat, depth_bnd


def downsampled_gt_depth(gt_depths, downsample: int, grid: GridConfig):
    """Min-pool lidar depth to feature resolution + one-hot depth bins.

    Parity: `get_downsampled_gt_depth` (`view_transformer.py:736-772`):
    zeros are treated as missing (1e5 before min-pool); bin index is
    (d - (lo - step)) / step with index 0 reserved for invalid.

    Args: gt_depths (B, N, H, W). Returns (B*N*h*w, D) one-hot float32.
    """
    B, N, H, W = gt_depths.shape
    D = grid.num_depth_bins
    x = gt_depths.reshape(
        B * N, H // downsample, downsample, W // downsample, downsample
    )
    x = x.transpose(0, 1, 3, 2, 4).reshape(-1, downsample * downsample)
    x = jnp.where(x == 0.0, 1e5, x)
    x = jnp.min(x, axis=-1)
    lo, hi, step = grid.depth
    idx = (x - (lo - step)) / step
    valid = (idx < D + 1) & (idx >= 0.0)
    idx = jnp.where(valid, idx, 0.0).astype(jnp.int32)
    onehot = jax.nn.one_hot(idx, D + 1, dtype=jnp.float32)
    return onehot[:, 1:]


def depth_bce_loss(depth_pred, gt_depths, downsample: int, grid: GridConfig,
                   weight: float = 0.05):
    """BEVDepth BCE depth supervision (`view_transformer.py:775-789`).

    Args:
      depth_pred: (B, N, D, Hf, Wf) softmaxed depth.
      gt_depths:  (B, N, H, W) sparse metric depth (0 = missing).
    """
    D = grid.num_depth_bins
    labels = downsampled_gt_depth(gt_depths, downsample, grid)
    preds = depth_pred.transpose(0, 1, 3, 4, 2).reshape(-1, D)
    fg = jnp.max(labels, axis=1) > 0.0
    preds = jnp.clip(preds, 1e-7, 1.0 - 1e-7)
    bce = -(labels * jnp.log(preds) + (1 - labels) * jnp.log(1 - preds))
    bce = (bce.sum(axis=1) * fg).sum()
    return weight * bce / jnp.maximum(fg.sum(), 1.0)
