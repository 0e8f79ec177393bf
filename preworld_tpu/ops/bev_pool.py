"""Lift-splat voxel pooling (BEVPoolv2) as a TPU-native op.

The reference implements this as a handwritten CUDA scatter kernel
(`mmdet3d/ops/bev_pool_v2/src/bev_pool_cuda.cu:21-121`): for each output voxel
interval over rank-sorted frustum points,
    out[v, c] = sum_{p in v} depth[ranks_depth[p]] * feat[ranks_feat[p], c].

TPU re-design: the frustum point count is a compile-time constant
(B*N*D*Hf*Wf), so instead of filtering + interval compression we keep every
point, map out-of-range points to a sentinel segment, SORT points by voxel id
and run a static-shape `segment_sum` of the depth x context outer product.
Sorting makes the scatter memory-pattern sequential, which XLA's TPU scatter
handles far better than random indices; the sort key depends only on geometry
(not on activations), so its gradient is a pure permutation.

The autodiff of (gather -> multiply -> segment_sum) reproduces exactly the
reference's handwritten backward (`bev_pool_cuda.cu:67-121`): the depth grad is
the per-point inner product over C, the feat grad the per-pixel sum over depth
bins — so no custom VJP is needed for the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bev_pool(
    depth: jnp.ndarray,
    feat: jnp.ndarray,
    vox_idx: jnp.ndarray,
    pix_idx: jnp.ndarray,
    num_voxels: int,
    sort_points: bool = True,
) -> jnp.ndarray:
    """Splat per-frustum-point (depth * context) into the voxel grid.

    Args:
      depth:   (B, N, D, Hf, Wf) softmaxed depth distribution.
      feat:    (B, N, Hf, Wf, C) context features.
      vox_idx: (B, N, D, Hf, Wf) int32 flattened voxel id in [0, num_voxels];
               == num_voxels marks out-of-range points (dropped).
      pix_idx: (B, N, D, Hf, Wf) int32 flattened (B*N*Hf*Wf) pixel id.
      num_voxels: B * Z * Y * X.
    Returns:
      (num_voxels, C) pooled features; caller reshapes to (B, Z, Y, X, C).
    """
    C = feat.shape[-1]
    d = depth.reshape(-1)
    v = vox_idx.reshape(-1)
    p = pix_idx.reshape(-1)
    feat_flat = feat.reshape(-1, C)

    if sort_points:
        order = jnp.argsort(v)
        v = v[order]
        d = d[order]
        p = p[order]

    vals = feat_flat[p] * d[:, None]
    out = jax.ops.segment_sum(
        vals,
        v,
        num_segments=num_voxels + 1,
        indices_are_sorted=sort_points,
    )
    return out[:num_voxels]


def bev_pool_dense_oracle(depth, feat, vox_idx, pix_idx, num_voxels):
    """O(P * V) dense reference used only by tests (numpy-style einsum oracle)."""
    import numpy as np

    C = feat.shape[-1]
    d = np.asarray(depth).reshape(-1)
    v = np.asarray(vox_idx).reshape(-1)
    p = np.asarray(pix_idx).reshape(-1)
    f = np.asarray(feat).reshape(-1, C)
    out = np.zeros((num_voxels, C), np.float64)
    for i in range(d.shape[0]):
        if v[i] < num_voxels:
            out[v[i]] += d[i] * f[p[i]]
    return out
