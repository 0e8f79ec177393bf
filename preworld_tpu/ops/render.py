"""Volume-rendering primitives as dense static-shape XLA ops.

TPU re-design of the reference's DVGO CUDA kernels
(`mmdet3d/models/nerf/cuda/render_utils_kernel.cu`,`ub360_utils_kernel.cu`) and
the ray sampler (`mmdet3d/models/nerf/nerf_head.py:32-55`). The reference
compacts rays dynamically (boolean masking at `nerf_head.py:200,229-253`);
on TPU we keep the full dense (rays, samples) grid and carry masks instead —
sample counts are compile-time constants, so XLA fuses the whole chain.

Kernels mapped:
  raw2alpha       (`render_utils_kernel.cu:431-444`)  -> elementwise jnp
  alpha2weight    (`render_utils_kernel.cu:577-651`)  -> exclusive cumprod +
                  early-exit-at-T<1e-3 reproduced as a mask on the exclusive
                  transmittance (the CUDA loop breaks AFTER writing sample i
                  when T drops below 1e-3, i.e. sample i is processed iff its
                  exclusive T >= 1e-3).
  cumdist_thres   (`ub360_utils_kernel.cu:13-32`)     -> lax.scan reset-accum.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RaySamplingSpec:
    """Static ray-marching geometry (parity: `nerf_head.py:105-163`)."""

    point_cloud_range: Tuple[float, ...] = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)
    radius: float = 39.0
    step_size: float = 0.5
    world_len: int = 200
    alpha_init: float = 1e-6
    early_exit_thres: float = 1e-3

    @property
    def scene_center(self) -> np.ndarray:
        lo = np.array(self.point_cloud_range[:3], np.float32)
        hi = np.array(self.point_cloud_range[3:], np.float32)
        return (lo + hi) * 0.5

    @property
    def bg_len(self) -> float:
        # (xrange/2 - radius) / radius  (`nerf_head.py:129`); uses python //
        # in the reference but xrange/2 = 40 exactly so plain division matches.
        xrange = self.point_cloud_range[3] - self.point_cloud_range[0]
        return (xrange // 2 - self.radius) / self.radius

    @property
    def num_inner(self) -> int:
        return int(2 / (2 + 2 * self.bg_len) * self.world_len / self.step_size) + 1

    @property
    def num_outer(self) -> int:
        return self.num_inner // 15

    @property
    def num_samples(self) -> int:
        return self.num_inner + self.num_outer

    @property
    def t_midpoints(self) -> np.ndarray:
        """Sample distances along the unit-normalized ray (`nerf_head.py:37-42`)."""
        b_inner = np.linspace(0, 2, self.num_inner + 1, dtype=np.float32)
        b_outer = 2.0 / np.linspace(1, 1 / 64, self.num_outer + 1, dtype=np.float32)
        return np.concatenate(
            [
                (b_inner[1:] + b_inner[:-1]) * 0.5,
                (b_outer[1:] + b_outer[:-1]) * 0.5,
            ]
        )

    @property
    def xyz_min(self) -> np.ndarray:
        """Normalized field bounds (`nerf_head.py:140-142`)."""
        lo = np.array(self.point_cloud_range[:3], np.float32)
        hi = np.array(self.point_cloud_range[3:], np.float32)
        z_ = (hi[2] - lo[2]) / (hi[0] - lo[0])
        b = self.bg_len
        return np.array([-1 - b, -1 - b, -z_], np.float32)

    @property
    def xyz_max(self) -> np.ndarray:
        return -self.xyz_min

    @property
    def act_shift(self) -> float:
        """Density bias shift so init alpha == alpha_init (`nerf_head.py:144`)."""
        return float(np.log(1 / (1 - self.alpha_init) - 1))

    @property
    def dist_thres(self) -> float:
        """Oversampling threshold (`nerf_head.py:197`)."""
        return (2 + 2 * self.bg_len) / self.world_len * self.step_size * 0.95


def sample_ray_points(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bda: jnp.ndarray,
    spec: RaySamplingSpec,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """March rays through the unit scene + contracted background.

    Parity with `sample_ray` (`nerf_head.py:32-55`): normalize origins by
    scene center/radius, sample at fixed midpoints, contract points with
    ||p|| > 1 to the background shell, then map into the bda-augmented frame.

    Args:
      rays_o, rays_d: (R, 3) in (un-augmented) key-ego metres.
      bda: (3, 3) BEV augmentation matrix.
    Returns:
      pts (R, S, 3) normalized+augmented, inner_mask (R, S), t (S,).
    """
    center = jnp.asarray(spec.scene_center)
    o = (rays_o - center) / spec.radius
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = jnp.asarray(spec.t_midpoints)
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    norm = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    inner = norm <= 1.0
    bg = spec.bg_len
    contracted = pts / norm * ((1 + bg) - bg / norm)
    pts = jnp.where(inner, pts, contracted)
    pts = jnp.einsum("ij,rsj->rsi", bda, pts)
    return pts, inner[..., 0], t


def cumdist_mask(
    pts: jnp.ndarray, inner_mask: jnp.ndarray, spec: RaySamplingSpec
) -> jnp.ndarray:
    """Keep-mask that drops oversampled (post-contraction bunched) points.

    Parity with `nerf_head.py:196-199` + `ub360_utils_kernel.cu:13-32`:
    accumulate inter-sample distance; a sample is kept when the running sum
    exceeds the threshold (the accumulator then resets). The first sample is
    always kept; inner points are always kept (mask OR).
    """
    dist = jnp.linalg.norm(pts[:, 1:] - pts[:, :-1], axis=-1)  # (R, S-1)
    thres = spec.dist_thres

    def step(cum, d):
        cum = cum + d
        over = cum > thres
        cum = cum * (1.0 - over.astype(cum.dtype))
        return cum, over

    _, over = jax.lax.scan(step, jnp.zeros(pts.shape[0], pts.dtype), dist.T)
    over = over.T  # (R, S-1)
    return jnp.concatenate([inner_mask[:, :1], inner_mask[:, 1:] | over], axis=1)


def raw2alpha(density: jnp.ndarray, shift: float, interval: float) -> jnp.ndarray:
    """alpha = 1 - exp(-softplus(density + shift) * interval).

    Identical to `Raw2Alpha` (`nerf/utils.py:26-50`,
    `render_utils_kernel.cu:431-444`): 1 - (1+exp(d+shift))^(-interval).
    """
    return 1.0 - jnp.exp(-jax.nn.softplus(density + shift) * interval)


def alpha2weight(
    alpha: jnp.ndarray,
    mask: jnp.ndarray,
    early_exit_thres: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense transmittance compositing with reference early-exit semantics.

    Args:
      alpha: (R, S) per-sample opacity.
      mask:  (R, S) bool; masked-out samples contribute nothing and pass
             transmittance through (replaces the reference's compaction).
    Returns:
      weights (R, S) = alpha * T_exclusive (zero where invalid);
      alphainv_last (R,) = transmittance after the last processed sample.
    """
    a = jnp.where(mask, alpha, 0.0)
    # exclusive cumprod of (1 - alpha): T[i] = prod_{j<i} (1 - a[j])
    t_excl = _exclusive_cumprod(1.0 - a)
    # early exit: a sample is processed iff its exclusive T >= thres.
    # t_excl is non-increasing (every factor <= 1), so `live` is a PREFIX
    # mask — which makes the zeroed-alpha recomposite recoverable from the
    # single cumprod (bitwise: same multiply sequence):
    #   * within the live prefix, the second exclusive cumprod equals the
    #     first (all earlier factors are unchanged), so
    #     weights = where(live, a * t_excl, 0);
    #   * alphainv_last = prod(1 - a_live) = the first INCLUSIVE T that
    #     drops below the threshold (the partial product at the exit
    #     point), or the full product if no sample exits.
    # One cumprod instead of two + a prod — cumprod (and its VJP) is the
    # compositing's serial-scan cost, and this runs in the render backward's
    # remat recompute as well.
    live = t_excl >= early_exit_thres
    weights = jnp.where(live, a * t_excl, 0.0)
    t_incl = t_excl * (1.0 - a)  # t_incl[i] = prod_{j<=i} (1 - a[j])
    below = t_incl < early_exit_thres
    first_below = jnp.max(jnp.where(below, t_incl, -jnp.inf), axis=1)
    alphainv_last = jnp.where(below.any(axis=1), first_below, t_incl[:, -1])
    return weights, alphainv_last


def _exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumprod along axis 1 (T[0] = 1)."""
    return jnp.concatenate(
        [jnp.ones_like(x[:, :1]), jnp.cumprod(x, axis=1)[:, :-1]], axis=1
    )
