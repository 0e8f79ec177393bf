"""Camera-aware DepthNet with ASPP and the BEVStereo temporal cost volume.

Parity: `mmdet3d/models/necks/view_transformer.py:322-638` (DepthNet, ASPP,
SELayer, cost volume). Channel-last; the stereo homography warp reuses the
library grid_sample (align_corners=True, zeros padding) exactly as the
reference's `F.grid_sample` call (`view_transformer.py:591-593`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.field_sample import build_corner_table_2d, sample_corner_table_2d
from ..ops.grid_sample import grid_sample_2d
from .layers import BasicBlock, ConvNormAct, Mlp, SELayer


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (`view_transformer.py:355-426`)."""

    inplanes: int
    mid_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilations = [1, 6, 12, 18]
        branches = []
        for i, d in enumerate(dilations):
            branches.append(
                ConvNormAct(
                    self.mid_channels,
                    1 if d == 1 else 3,
                    padding="SAME",
                    dilation=d,
                    dtype=self.dtype,
                    name=f"aspp{i + 1}",
                )(x, train)
            )
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = ConvNormAct(
            self.mid_channels, 1, dtype=self.dtype, name="global_branch"
        )(gap, train)
        gap = jnp.broadcast_to(
            gap, (*branches[0].shape[:-1], self.mid_channels)
        )
        y = jnp.concatenate(branches + [gap], axis=-1)
        y = ConvNormAct(self.inplanes, 1, dtype=self.dtype, name="proj")(y, train)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return y


def gen_stereo_grid(
    frustum: jnp.ndarray,
    k2s_sensor: jnp.ndarray,
    intrins: jnp.ndarray,
    post_rots: jnp.ndarray,
    post_trans: jnp.ndarray,
    img_size_hw,
):
    """Homography warp grid: project the current frame's cv-frustum into the
    previous frame's image plane (`view_transformer.py:546-574`).

    Args:
      frustum: (D, H, W, 3) at cv_downsample resolution (pixel coords in the
               *input image* space + metric depth).
      k2s_sensor: (B, N, 4, 4) current-sensor -> previous-sensor.
      intrins, post_rots: (B, N, 3, 3); post_trans: (B, N, 3).
      img_size_hw: input image (H, W) for normalization.
    Returns:
      (B*N, D*H, W, 2) normalized grid; invalid (behind-camera) points at -2.
    """
    B, N = k2s_sensor.shape[:2]
    D, H, W = frustum.shape[:3]
    hi, wi = img_size_hw
    rots = k2s_sensor[:, :, :3, :3]
    trans = k2s_sensor[:, :, :3, 3]
    inv_post = jnp.linalg.inv(post_rots)

    # The chain is projective: only the homogeneous lift (xy * z) and the
    # final perspective divide are nonlinear, and both are elementwise. All
    # matrix stages therefore compose into per-(b, n) SCALAR coefficients,
    # and the whole grid is a fused elementwise polynomial in the frustum
    # coords — the previous formulation ran FOUR einsums over the
    # (B, N, D, H, W, 3) point array, each breaking XLA fusion and
    # materializing a ~285 MB intermediate at flagship scale (this chain,
    # not the Pallas kernel, dominated the cost-volume stage's HBM bytes).
    # Composition assumes the standard pinhole K with third row (0, 0, 1) —
    # true for every shipped dataset — under which the camera-frame z used
    # for the behind-camera mask is preserved by K.
    #
    # With q = inv_post @ (p - post_trans) = L[:, :3] @ p + L[:, 3] and the
    # lift q' = (qx qz, qy qz, qz):
    #   r = K R K^-1 q' + K t  =>  r_i = qz * (M_i0 qx + M_i1 qy + M_i2)
    #                                    + t1_i
    # i.e. r_i = qz * s_i + t1_i with s, qz affine in (u, v, d).
    tp = jnp.einsum("bnij,bnj->bni", inv_post, post_trans)
    L = jnp.concatenate([inv_post, -tp[..., None]], axis=-1)  # (B, N, 3, 4)
    M = intrins @ rots @ jnp.linalg.inv(intrins)  # K R K^-1
    t1 = jnp.einsum("bnij,bnj->bni", intrins, trans)
    S = jnp.einsum("bnik,bnkj->bnij", M[:, :, :, :2], L[:, :, :2, :])
    S = S.at[:, :, :, 3].add(M[:, :, :, 2])  # constant M_i2 term

    u, v, dd = frustum[..., 0], frustum[..., 1], frustum[..., 2]  # (D, H, W)

    def affine(c):  # c: (B, N, 4) -> broadcast-evaluated (B, N, D, H, W)
        c = c[:, :, None, None, None, :]
        return c[..., 0] * u + c[..., 1] * v + c[..., 2] * dd + c[..., 3]

    qz = affine(L[:, :, 2])
    z = qz * affine(S[:, :, 2]) + t1[:, :, 2, None, None, None]
    x = qz * affine(S[:, :, 0]) + t1[:, :, 0, None, None, None]
    y = qz * affine(S[:, :, 1]) + t1[:, :, 1, None, None, None]
    neg_mask = z < 1e-3
    x = x / z
    y = y / z
    # fold the 2-D post-aug rotation, translation and [-1, 1] normalization
    # into the same per-(b, n) scalar form
    sx, sy = 2.0 / (wi - 1.0), 2.0 / (hi - 1.0)

    def c2(i, j):
        return (post_rots[:, :, i, j])[:, :, None, None, None]

    tx = (post_trans[:, :, 0] * sx - 1.0)[:, :, None, None, None]
    ty = (post_trans[:, :, 1] * sy - 1.0)[:, :, None, None, None]
    px = (c2(0, 0) * x + c2(0, 1) * y) * sx + tx
    py = (c2(1, 0) * x + c2(1, 1) * y) * sy + ty
    px = jnp.where(neg_mask, -2.0, px)
    py = jnp.where(neg_mask, -2.0, py)
    grid = jnp.stack([px, py], axis=-1)
    return grid.reshape(B * N, D * H, W, 2)


def gen_stereo_homography(
    frustum: jnp.ndarray,
    k2s_sensor: jnp.ndarray,
    intrins: jnp.ndarray,
    post_rots: jnp.ndarray,
    post_trans: jnp.ndarray,
    img_size_hw,
) -> jnp.ndarray:
    """Per-depth-plane 3x3 homographies equivalent to `gen_stereo_grid`.

    For a FIXED depth plane the warp chain of `gen_stereo_grid` is
    projective in the output pixel index: every stage is affine in (u, v)
    once the homogeneous lift's z-coordinate qz is constant per plane —
    true whenever the image post-aug is 2-D (post_rots third row (0,0,1),
    the form every shipped pipeline produces; `loading.py:934-953` builds
    post_rot from 2-D resize/crop/flip/rotate only). The whole
    (BN, D, H, W, 2) grid tensor (~104 MB at flagship scale, plus the
    packing's full-array reductions over it) then collapses to
    (BN, D, 3, 3) = 19 KB of coefficients that the fused plane-sweep kernel
    evaluates in-register (ops/cost_volume_pallas.py::plane_sweep_cost_hom).

    Returns H (B*N, D, 3, 3) f32 mapping OUTPUT feature-pixel indices
    (w, h, 1) homogeneously to PREVIOUS-frame feature-pixel coords:
    gx = (H0 . (w,h,1)) / z, gy = (H1 . (w,h,1)) / z with z = H2 . (w,h,1);
    z < 1e-3 marks behind-camera samples (the grid path's -2 sentinel).
    """
    B, N = k2s_sensor.shape[:2]
    D, Hf, Wf = frustum.shape[:3]
    hi, wi = img_size_hw
    rots = k2s_sensor[:, :, :3, :3]
    trans = k2s_sensor[:, :, :3, 3]
    inv_post = jnp.linalg.inv(post_rots)
    tp = jnp.einsum("bnij,bnj->bni", inv_post, post_trans)
    L = jnp.concatenate([inv_post, -tp[..., None]], axis=-1)
    M = intrins @ rots @ jnp.linalg.inv(intrins)
    t1 = jnp.einsum("bnij,bnj->bni", intrins, trans)
    S = jnp.einsum("bnik,bnkj->bnij", M[:, :, :, :2], L[:, :, :2, :])
    S = S.at[:, :, :, 3].add(M[:, :, :, 2])

    dd = frustum[:, 0, 0, 2].astype(jnp.float32)  # (D,) plane depths
    # qz = L[2] . (u, v, d, 1) with L[2,:2] = 0 (2-D post-aug) -> per-plane
    # constant
    qzc = L[:, :, 2, 2][..., None] * dd + L[:, :, 2, 3][..., None]  # (B,N,D)

    def hrow(i):
        a = qzc * S[:, :, i, 0][..., None]
        b = qzc * S[:, :, i, 1][..., None]
        c = (
            qzc * (S[:, :, i, 2][..., None] * dd + S[:, :, i, 3][..., None])
            + t1[:, :, i][..., None]
        )
        return jnp.stack([a, b, c], axis=-1)  # (B, N, D, 3) in (u, v, 1)

    Hx, Hy, Hz = hrow(0), hrow(1), hrow(2)
    # previous-frame post-aug + [-1,1] normalization + feature-pixel scale,
    # exactly gen_stereo_grid's tail followed by the kernel's
    # (grid+1)*0.5*(Wf-1) conversion: ax = (Wf-1)/(wi-1)
    ax = (Wf - 1.0) / (wi - 1.0)
    ay = (Hf - 1.0) / (hi - 1.0)

    def pc(i, j):
        return post_rots[:, :, i, j][..., None, None]

    ptx = post_trans[:, :, 0][..., None, None]
    pty = post_trans[:, :, 1][..., None, None]
    Gx = ax * (pc(0, 0) * Hx + pc(0, 1) * Hy + ptx * Hz)
    Gy = ay * (pc(1, 0) * Hx + pc(1, 1) * Hy + pty * Hz)
    G = jnp.stack([Gx, Gy, Hz], axis=-2)  # (B, N, D, 3, 3) over (u, v, 1)
    # fold the frustum's pixel-index -> input-pixel affine (u = u0 + su*w,
    # v = v0 + sv*h) so the homography acts on raw output indices
    u0 = frustum[0, 0, 0, 0]
    su = (frustum[0, 0, 1, 0] - u0) if Wf > 1 else jnp.float32(1.0)
    v0 = frustum[0, 0, 0, 1]
    sv = (frustum[0, 1, 0, 1] - v0) if Hf > 1 else jnp.float32(1.0)
    zero = jnp.zeros_like(u0)
    one = jnp.ones_like(u0)
    T = jnp.stack([
        jnp.stack([su, zero, u0]),
        jnp.stack([zero, sv, v0]),
        jnp.stack([zero, zero, one]),
    ])
    H = G @ T
    return H.reshape(B * N, D, 3, 3).astype(jnp.float32)


def stereo_cost_volume(
    prev_feat: jnp.ndarray,
    curr_feat: jnp.ndarray,
    grid: jnp.ndarray,
    bias: float,
    depth_chunk: int = 8,
) -> jnp.ndarray:
    """Abs-diff plane-sweep cost (`view_transformer.py:576-604`).

    TPU memory note: the reference loops over channel GROUPS to bound the
    (C, D, H, W) warped tensor on GPU; summing |curr - warp| over all C is
    identical math, so on TPU we instead scan over DEPTH-plane chunks with
    `lax.map`, keeping the live intermediate at (BN, C, chunk*H, W) — flat in
    D — which fits HBM even at 88 depth bins x 6 cams full-res.

    Args:
      prev_feat, curr_feat: (B*N, H, W, C) stereo features (cv resolution).
      grid: (B*N, D*H, W, 2) from `gen_stereo_grid`.
      bias: added where the warp lands outside the previous image.
    Returns:
      (B*N, D, H, W) depth probability (softmax over D of negated cost).
    """
    BN, H, W, C = curr_feat.shape
    D = grid.shape[1] // H
    assert D % depth_chunk == 0, (D, depth_chunk)
    prev_nchw = prev_feat.transpose(0, 3, 1, 2)
    curr_nchw = curr_feat.transpose(0, 3, 1, 2)
    grid_chunks = grid.reshape(BN, D // depth_chunk, depth_chunk * H, W, 2)
    grid_chunks = grid_chunks.transpose(1, 0, 2, 3, 4)

    def one_chunk(grid_c):
        warped = grid_sample_2d(prev_nchw, grid_c, align_corners=True)
        warped = warped.reshape(BN, C, depth_chunk, H, W)
        diff = jnp.abs(curr_nchw[:, :, None] - warped).sum(axis=1)
        # reference checks channel 0 of the LAST 4-channel group (its
        # `wrap_prev` holds the final group after the loop,
        # view_transformer.py:600-601) — global channel C-4
        invalid = warped[:, max(C - 4, 0)] == 0.0
        return diff + invalid.astype(diff.dtype) * bias

    cost = jax.lax.map(one_chunk, grid_chunks)  # (D/ck, BN, ck, H, W)
    cost = cost.transpose(1, 0, 2, 3, 4).reshape(BN, D, H, W)
    return nn.softmax(-cost, axis=1)


def stereo_cost_volume_expanded(
    prev_feat: jnp.ndarray,
    curr_feat: jnp.ndarray,
    grid: jnp.ndarray,
    bias: float,
    depth_chunk: int = 8,
) -> jnp.ndarray:
    """`stereo_cost_volume` with the warp's bilinear gather done through a
    corner-expanded table (ops/field_sample.py): one contiguous 4C-row per
    sample instead of a strided (2,2,C) patch. Same math, same output.

    TPU placement note: cameras are processed in an UNROLLED python loop, not
    vmap — a vmapped gather would batch the six per-camera tables into one
    (6·(H+1)(W+1), 4C) operand (~280 MB at flagship scale), which exceeds
    VMEM and drops the gather into the slow HBM descriptor regime (~71 M
    desc/s measured on v5e). One table per gather op (~47 MB) stays
    VMEM-resident at ~200+ M desc/s — measured 4.4x faster end-to-end.
    """
    BN, H, W, C = curr_feat.shape
    D = grid.shape[1] // H
    assert D % depth_chunk == 0, (D, depth_chunk)
    grid = grid.reshape(BN, D, H, W, 2)

    def per_cam(table, gcam, curr):
        def one_chunk(gc):  # (chunk, H, W, 2)
            x = (gc[..., 0].reshape(-1) + 1.0) * 0.5 * (W - 1)
            y = (gc[..., 1].reshape(-1) + 1.0) * 0.5 * (H - 1)
            warped = sample_corner_table_2d(table, (H, W), x, y)
            warped = warped.reshape(depth_chunk, H, W, C)
            diff = jnp.abs(curr[None] - warped).sum(-1)
            # channel C-4: see stereo_cost_volume (reference last-group quirk)
            invalid = warped[..., max(C - 4, 0)] == 0.0
            return diff + invalid.astype(diff.dtype) * bias

        gc = gcam.reshape(D // depth_chunk, depth_chunk, H, W, 2)
        return jax.lax.map(one_chunk, gc).reshape(D, H, W)

    cost = jnp.stack(
        [
            per_cam(build_corner_table_2d(prev_feat[i]), grid[i], curr_feat[i])
            for i in range(BN)
        ]
    )
    return nn.softmax(-cost, axis=1)


def stereo_cost_volume_fused(
    prev_feat: jnp.ndarray,
    curr_feat: jnp.ndarray,
    grid: jnp.ndarray,
    bias: float,
    depth_chunk: int = 8,  # unused; signature parity with the XLA paths
) -> jnp.ndarray:
    """`stereo_cost_volume` via the fused Pallas plane-sweep kernel
    (ops/cost_volume_pallas.py): one y-band window DMA per output-tile
    depth segment + MXU one-hot contraction instead of 24 GB of
    descriptor-rate-bound gather rows. TPU only; the r3 default there.
    """
    del depth_chunk
    from ..ops.cost_volume_pallas import plane_sweep_cost

    cost = plane_sweep_cost(prev_feat, curr_feat, grid, bias=float(bias))
    return nn.softmax(-cost, axis=1).astype(curr_feat.dtype)


class DepthNet(nn.Module):
    """27-dim camera-conditioned depth + context head (`view_transformer.py:471-638`).

    Input feature (B*N, Hf, Wf, in_channels); returns (B*N, Hf, Wf, D + C_ctx).
    """

    mid_channels: int
    context_channels: int
    depth_channels: int
    use_aspp: bool = True
    aspp_mid_channels: int = 96
    stereo: bool = False
    cost_volume_bias: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mlp_input: jnp.ndarray,
        cost_volume: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        mlp_input = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="mlp_bn",
        )(mlp_input.reshape(-1, mlp_input.shape[-1]))
        x = ConvNormAct(
            self.mid_channels, 3, use_bias=True, dtype=self.dtype,
            name="reduce_conv",
        )(x, train)
        ctx_se = Mlp(self.mid_channels, self.mid_channels, dtype=self.dtype,
                     name="context_mlp")(mlp_input)
        context = SELayer(self.mid_channels, dtype=self.dtype,
                          name="context_se")(x, ctx_se)
        context = nn.Conv(
            self.context_channels, (1, 1), use_bias=True, dtype=self.dtype,
            name="context_conv",
        )(context)
        depth_se = Mlp(self.mid_channels, self.mid_channels, dtype=self.dtype,
                       name="depth_mlp")(mlp_input)
        depth = SELayer(self.mid_channels, dtype=self.dtype, name="depth_se")(
            x, depth_se
        )
        in_ch = self.mid_channels
        if self.stereo:
            assert cost_volume is not None
            # two stride-2 conv+bn stages: cv res (input/4) -> feat res (input/16)
            cv = cost_volume.transpose(0, 2, 3, 1)  # (BN, H, W, D)
            for i in range(2):
                cv = ConvNormAct(
                    self.depth_channels, 3, strides=2, use_bias=True,
                    act=None, dtype=self.dtype, name=f"cost_volumn_net{i}",
                )(cv, train)
            depth = jnp.concatenate([depth, cv], axis=-1)
            in_ch = self.mid_channels + self.depth_channels
        depth = BasicBlock(
            self.mid_channels,
            downsample=in_ch != self.mid_channels,
            downsample_kernel=1,
            downsample_norm=False,
            dtype=self.dtype,
            name="depth_block0",
        )(depth, train)
        depth = BasicBlock(self.mid_channels, dtype=self.dtype,
                           name="depth_block1")(depth, train)
        depth = BasicBlock(self.mid_channels, dtype=self.dtype,
                           name="depth_block2")(depth, train)
        if self.use_aspp:
            depth = ASPP(
                self.mid_channels, self.aspp_mid_channels, dtype=self.dtype,
                name="aspp",
            )(depth, train)
        depth = nn.Conv(
            self.depth_channels, (1, 1), use_bias=True, dtype=self.dtype,
            name="depth_pred",
        )(depth)
        return jnp.concatenate([depth, context], axis=-1)
