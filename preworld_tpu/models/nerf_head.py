"""Volume-rendering supervision head (parameter-free renderer + losses).

Parity: `mmdet3d/models/nerf/nerf_head.py:105-420`. Differences by design
(TPU static shapes): rays arrive as a FIXED-size (R, 16) array; instead of
the reference's dynamic compactions (`nerf_head.py:200,228-253`) we mask —
the `fast_color_thres` cutoffs are reproduced exactly by zeroing alpha /
weights below threshold (removing a sample from the reference's flat list is
equivalent to treating it as fully transparent).

The whole render is vmapped over the batch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..ops.field_sample import build_parity_tables, sample_tables_fused
from ..ops.grid_sample import grid_sample_3d
from ..ops.render import (
    RaySamplingSpec,
    alpha2weight,
    cumdist_mask,
    raw2alpha,
    sample_ray_points,
)

# occ3d-nuscenes class frequencies (`nerf_head.py:22-24`)
NUSC_CLASS_FREQUENCIES = np.array(
    [
        1163161, 2309034, 188743, 2997643, 20317180, 852476, 243808, 2457947,
        497017, 2731022, 7224789, 214411435, 5565043, 63191967, 76098082,
        128860031, 141625221, 2307405309,
    ],
    np.float64,
)


def nusc_class_weights(num: int = 17) -> np.ndarray:
    """1 / log(freq + 0.001) balance weights (`nerf_head.py:160-162`)."""
    return (1.0 / np.log(NUSC_CLASS_FREQUENCIES[:num] + 0.001)).astype(np.float32)


def voxel_class_weights(num_classes: int, balance: bool = True) -> np.ndarray:
    """Per-class CE weights incl. the zeroed empty class.

    18-class Occ3D: nuScenes log-balance profile when `balance` (reference
    `preworld.py:60-68`; balance_cls_weight=False gives the reference's
    uniform ones(17)/17 ablation). nuPlan 12-class: uniform with the
    placeholder classes zeroed — the reference's nuPlan branch zeroes
    classes 1:4 and 11: (`preworld.py:63-65`; its frequency table is
    undefined/unshipped, so uniform over the live classes is the sane
    stand-in for the balanced profile).
    """
    if num_classes == 12:
        from ..data.nuplan import NUPLAN_CLASS_WEIGHT_MASK

        return NUPLAN_CLASS_WEIGHT_MASK.copy()
    if balance and num_classes == 18:
        w = nusc_class_weights(17)
    else:
        n = num_classes - 1
        w = np.ones(n, np.float32) / n
    return np.concatenate([w, np.zeros(1, np.float32)])


@dataclasses.dataclass(frozen=True)
class NerfHeadConfig:
    spec: RaySamplingSpec = RaySamplingSpec()
    use_depth_sup: bool = True
    weight_depth: float = 1.0
    weight_semantic: float = 1.0
    weight_color: float = 1.0
    weight_entropy_last: float = 0.01
    weight_distortion: float = 0.01
    fast_color_thres: float = 1e-7
    balance_cls_weight: bool = True
    max_depth: float = 52.0
    variance_focus: float = 0.85
    # dtype of the gather tables the renderer samples from: "auto" uses
    # bfloat16 on TPU (each z-parity table then fits VMEM — the fast gather
    # regime; see ops/field_sample.py) and float32 elsewhere. Trilinear
    # weights and compositing stay float32 either way.
    table_dtype: str = "auto"
    # 0 (default) renders all rays densely in one pass: with the fused
    # corner-table sampler the largest live intermediate is the sampled
    # (R*S, C) values (~1.3 GB f32 at flagship scale), and the backward does
    # ONE corner8-layout scatter+fold. ray_chunk > 0 is a memory fallback
    # (lax.map + remat over ray chunks) — it multiplies the backward's
    # table-fold cost by the chunk count, so prefer dense when HBM allows.
    ray_chunk: int = 0
    # per-ray live-sample cap for the backward scatter (0 = off). Early
    # exit + fast_color_thres give dead samples exactly-zero cotangents
    # (typically >90% of samples), so the descriptor-bound scatter shrinks
    # ~S/cap-fold. Two-tier exact scheme: rays whose live count exceeds
    # the cap (grazing rays) are scattered whole in a second pass, and a
    # lax.cond falls back to the full scatter only if more than ~R/64 rays
    # overflow — results are exact on every branch. See
    # ops/field_sample.py::_corner8_scatter_grad.
    bwd_live_cap: int = 0


def _sample_field(field_xyzc: jnp.ndarray, pts_norm: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of an (X, Y, Z, C) field at normalized [-1,1] coords.

    Matches the reference's grid_sample call with `.flip(-1)` coords
    (`nerf_head.py:209-225`, align_corners=True). Kept as the readable
    oracle for the corner-table fast path (ops/field_sample.py) — see
    tests/test_ops.py::TestFieldSample.
    """
    X, Y, Z, C = field_xyzc.shape
    inp = field_xyzc.transpose(3, 0, 1, 2)[None]  # (1, C, X, Y, Z)
    grid = pts_norm[..., ::-1][None]  # (1, ..., 3) as (z, y, x)
    out = grid_sample_3d(inp, grid, align_corners=True)[0]
    return jnp.moveaxis(out, 0, -1)  # (..., C)


def render_scene(
    density: jnp.ndarray,
    semantic: jnp.ndarray,
    color: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bda: jnp.ndarray,
    cfg: NerfHeadConfig,
    ray_mask: jnp.ndarray = None,
    axis_name: str = None,
) -> Dict[str, jnp.ndarray]:
    """Render depth/semantic/color for R rays against one voxel scene.

    Parity: `render_one_scene` + the three `render_*` reducers
    (`nerf_head.py:165-269,331-353`). Rays are processed in `cfg.ray_chunk`
    slices under `jax.checkpoint` (see NerfHeadConfig.ray_chunk).

    When `ray_mask` (R,) is given, the distortion loss is reduced in-scene
    and returned as the scalar "loss_distortion" instead of shipping the
    (R, S) weights/s/live arrays to the caller — those three arrays are
    ~200 MB each at flagship scale and only feed the distortion reduction.

    `axis_name`: set when running inside shard_map with the ray dim split
    over that mesh axis (sequence parallelism) — the scene-wide distortion
    sums then psum across it, so per-shard results match the dense render
    exactly.
    """
    R = rays_o.shape[0]
    chunk = min(cfg.ray_chunk, R) if cfg.ray_chunk > 0 else R
    if R % chunk != 0:  # fall back to one pass for odd test sizes
        chunk = R
    n_chunks = R // chunk

    # sample the three fields with ONE fused gather op (21 channels) via the
    # z-parity corner tables: two VMEM-regime descriptors per (ray, sample),
    # single 8-corner-layout scatter in the backward (sample_tables_fused).
    # Tables are built ONCE per scene, outside the remat'd ray chunks;
    # stop_gradient because the custom VJP already yields the FULL d_field.
    fused = jnp.concatenate([density[..., None], semantic, color], axis=-1)
    tdt = cfg.table_dtype
    if tdt == "auto":
        tdt = "bfloat16" if jax.default_backend() == "tpu" else None
    t_e, t_o = build_parity_tables(jax.lax.stop_gradient(fused), tdt)

    # under remat, keep the sampled field values as residuals (the gathers
    # are the expensive part) plus the cumdist keep-mask: it is produced by
    # a genuinely sequential 416-step lax.scan over pure ray geometry
    # (carries a resetting accumulator), so recomputing it inside the
    # backward serializes ~S tiny VPU steps for a value that costs only
    # R*S bools (~16 MB) to keep
    policy = jax.checkpoint_policies.save_only_these_names(
        "render_sampled", "render_keep"
    )

    @partial(jax.checkpoint, policy=policy)
    def one_chunk(args):
        ro, rd, m = args
        return _render_rays(fused, t_e, t_o, ro, rd, bda, cfg, m)

    if ray_mask is None:
        ray_mask = jnp.ones((R,), jnp.float32)
    if n_chunks == 1:
        # same residual policy as the chunked path: keep only the sampled
        # field values; geometry + compositing recompute in the backward
        # (cheap VPU math, no re-gather). This is what lets two scenes'
        # renders coexist in 16 GB HBM at flagship scale (B=2 per chip).
        out = jax.checkpoint(
            lambda a: _render_rays(fused, t_e, t_o, a[0], a[1], bda, cfg,
                                   a[2]),
            policy=policy,
        )((rays_o, rays_d, ray_mask))
    else:
        out = jax.lax.map(
            one_chunk,
            (
                rays_o.reshape(n_chunks, chunk, 3),
                rays_d.reshape(n_chunks, chunk, 3),
                ray_mask.reshape(n_chunks, chunk),
            ),
        )
        out = {
            k: (v.sum(axis=0) if k.startswith("dist_")
                else v.reshape(R, *v.shape[2:]))
            for k, v in out.items()
        }
    # distortion (flatten_eff_distloss parity, `nerf_head.py:295-298`):
    # interval = 1/n_max with n_max = surviving supervised samples scene-
    # wide; normalized by the number of supervised rays
    sums = jnp.stack([
        out.pop("dist_live"), out.pop("dist_bi"), out.pop("dist_w2"),
        ray_mask.sum(),
    ])
    if axis_name is not None:  # ray dim is sharded: sums must be scene-wide
        sums = jax.lax.psum(sums, axis_name)
    n_max = jnp.maximum(sums[0], 1.0)
    n_rays = jnp.maximum(sums[3], 1.0)
    out["loss_distortion"] = (
        2.0 * sums[1] + (1.0 / 3.0) / n_max * sums[2]
    ) / n_rays
    return out


def _render_rays(fused, t_e, t_o, rays_o, rays_d, bda, cfg, ray_mask):
    spec = cfg.spec
    pts, inner, t = sample_ray_points(rays_o, rays_d, bda, spec)
    keep = checkpoint_name(cumdist_mask(pts, inner, spec), "render_keep")

    lo = jnp.asarray(spec.xyz_min)
    hi = jnp.asarray(spec.xyz_max)
    pts_norm = (pts - lo) / (hi - lo) * 2.0 - 1.0

    sampled = sample_tables_fused(
        fused, t_e, t_o, pts_norm, cfg.bwd_live_cap
    )  # (R, S, 21)
    sampled = checkpoint_name(sampled, "render_sampled")
    nsem = fused.shape[-1] - 4
    dens = sampled[..., 0]
    sem = sampled[..., 1 : 1 + nsem]
    col = sampled[..., 1 + nsem :]

    alpha = raw2alpha(dens, spec.act_shift, interval=0.5)
    if cfg.fast_color_thres > 0:
        keep = keep & (alpha > cfg.fast_color_thres)
    weights, alphainv_last = alpha2weight(alpha, keep, spec.early_exit_thres)
    if cfg.fast_color_thres > 0:
        live = weights > cfg.fast_color_thres
        weights = jnp.where(live, weights, 0.0)
    else:
        live = keep

    s = 1.0 - 1.0 / (1.0 + t)  # (S,)
    render_depth = (weights * s[None, :]).sum(axis=1) * spec.radius + 1e-7
    render_sem = (weights[..., None] * sem).sum(axis=1)
    render_col = (weights[..., None] * col).sum(axis=1)

    # distortion partial sums (chunk-additive; see render_scene): the
    # bilateral term uses prefix sums so the (S, S) pairwise product never
    # materializes (flatten_eff_distloss parity, `nerf_head.py:295-298`)
    w = weights * ray_mask[:, None]
    sb = s[None, :]
    wm = w * sb
    w_prefix = jnp.cumsum(w, axis=1) - w
    wm_prefix = jnp.cumsum(wm, axis=1) - wm
    dist_bi = (w * (sb * w_prefix - wm_prefix)).sum()
    dist_w2 = (w * w).sum()
    dist_live = (live * ray_mask[:, None]).sum()
    return {
        "render_depth": render_depth,
        "render_semantic": render_sem,
        "render_color": render_col,
        "alphainv_last": alphainv_last,
        "dist_bi": dist_bi,
        "dist_w2": dist_w2,
        "dist_live": dist_live,
    }


def _render_batch(
    density, semantic, color, rays_o, rays_d, bda, cfg, ray_mask, mesh=None
):
    """Stacked per-scene renders; shard_mapped over ('data', 'seq') when a
    mesh is given.

    The render is a python loop over scenes (a vmapped gather would lower to
    batched-gather dimension numbers that miss the fast TPU descriptor path
    — CLAUDE.md gather rules), so under plain GSPMD-jit the graph unrolls
    once per GLOBAL batch row: compile time scales with the device count,
    and each per-scene subgraph slices a data-sharded dim (replication
    hazard). shard_map makes the loop run over the LOCAL batch (typically 1
    scene/device) with the ray dim split over 'seq' — the render compiles
    once, executes purely device-locally, and only the scene-wide distortion
    sums cross shards (one 4-scalar psum inside render_scene). Falls back to
    the dense path when shapes don't divide the mesh.
    """

    def body(de, se, co, ro, rd, bd, m, axis_name=None):
        per_scene = [
            render_scene(
                de[i], se[i], co[i], ro[i], rd[i], bd[i], cfg, m[i],
                axis_name=axis_name,
            )
            for i in range(de.shape[0])
        ]
        return {
            k: jnp.stack([p[k] for p in per_scene]) for k in per_scene[0]
        }

    B, R = ray_mask.shape
    if mesh is not None:
        nd = mesh.shape.get("data", 1)
        ns = mesh.shape.get("seq", 1)
        if nd * ns > 1 and B % nd == 0 and R % ns == 0:
            from jax.sharding import PartitionSpec as P

            pb, pbr = P("data"), P("data", "seq")
            return jax.shard_map(
                partial(body, axis_name="seq"),
                mesh=mesh,
                in_specs=(pb, pb, pb, pbr, pbr, pb, pbr),
                out_specs={
                    "render_depth": pbr,
                    "render_semantic": pbr,
                    "render_color": pbr,
                    "alphainv_last": pbr,
                    "loss_distortion": pb,
                },
                check_vma=False,
            )(density, semantic, color, rays_o, rays_d, bda, ray_mask)
    return body(density, semantic, color, rays_o, rays_d, bda, ray_mask)


def _weighted_ce(logits, targets, class_w, mask):
    """torch CrossEntropyLoss(weight=w, reduction='mean') with a ray mask:
    sum(w[t] * ce) / sum(w[t]) over masked rays.

    Labels are clipped BEFORE the log-prob gather: masked rays may carry
    out-of-range labels, and an OOB take_along_axis under jit fills NaN,
    which would poison the mean through NaN * 0."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = jnp.clip(targets.astype(jnp.int32), 0, class_w.shape[0] - 1)
    ce = -jnp.take_along_axis(logp, t[:, None], axis=1)[:, 0]
    w = class_w[t] * mask
    return (ce * w).sum() / jnp.maximum(w.sum(), 1e-8)


def _silog(est, gt, mask, variance_focus=0.85):
    """Scale-invariant log depth loss (`nerf/utils.py:71-78`), masked."""
    d = (jnp.log(est) - jnp.log(jnp.maximum(gt, 1e-8))) * mask
    n = jnp.maximum(mask.sum(), 1.0)
    mean_sq = (d * d).sum() / n
    mean = d.sum() / n
    return jnp.sqrt(jnp.maximum(mean_sq - variance_focus * mean * mean, 1e-12))


def nerf_head_losses(
    density: jnp.ndarray,
    semantic: jnp.ndarray,
    color: jnp.ndarray,
    rays: jnp.ndarray,
    bda: jnp.ndarray,
    cfg: NerfHeadConfig,
    suffix: str = "",
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Batched rendering losses (parity: `NerfHead.forward` + `compute_loss`,
    `nerf_head.py:271-299,361-420`; temporal suffixing `:301-329`).

    Args:
      density: (B, X, Y, Z); semantic: (B, X, Y, Z, 17); color: (B, X, Y, Z, 3)
      rays: (B, R, 16) fixed-size ray records; bda: (B, 3, 3).
      mesh: optional jax Mesh — the render then runs under shard_map with
        scenes over 'data' and rays over 'seq' (see _render_batch). Loss
        reductions below stay on the (small) global per-ray arrays.
    Returns: dict of scalar losses averaged over the batch.
    """
    gt_depth = rays[..., 2]
    gt_sem = rays[..., 3]
    rays_o = rays[..., 4:7]
    rays_d = rays[..., 7:10]
    gt_color = rays[..., 13:16]

    gt_depth = jnp.where(gt_depth > cfg.max_depth, 0.0, gt_depth)
    ray_mask = (gt_depth > 0).astype(jnp.float32)

    out = _render_batch(
        density, semantic, color, rays_o, rays_d, bda, cfg, ray_mask, mesh
    )

    n_sem = semantic.shape[-1]
    class_w = jnp.asarray(
        nusc_class_weights(n_sem) if cfg.balance_cls_weight and n_sem == 17
        else np.ones(n_sem, np.float32) / n_sem
    )

    def per_item(i):
        m = ray_mask[i]
        losses = {}
        if cfg.use_depth_sup:
            losses["loss_render_depth" + suffix] = cfg.weight_depth * _silog(
                out["render_depth"][i] + 1e-7, gt_depth[i], m,
                cfg.variance_focus,
            )
        losses["loss_render_semantic" + suffix] = (
            cfg.weight_semantic
            * _weighted_ce(out["render_semantic"][i], gt_sem[i], class_w, m)
        )
        # l1 color: sum over channels of masked mean (`loss.py:116-122`)
        diff = jnp.abs(out["render_color"][i] - gt_color[i]) * m[:, None]
        losses["loss_render_color" + suffix] = cfg.weight_color * (
            diff.sum(axis=0) / jnp.maximum(m.sum(), 1.0)
        ).sum()
        if cfg.weight_entropy_last > 0:
            pout = jnp.clip(out["alphainv_last"][i], 1e-6, 1 - 1e-6)
            ent = -(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))
            losses["loss_sdf_entropy" + suffix] = cfg.weight_entropy_last * (
                (ent * m).sum() / jnp.maximum(m.sum(), 1.0)
            )
        if cfg.weight_distortion > 0:
            losses["loss_sdf_distortion" + suffix] = (
                cfg.weight_distortion * out["loss_distortion"][i]
            )
        return losses

    B = rays.shape[0]
    acc: Dict[str, jnp.ndarray] = {}
    for i in range(B):
        for k, v in per_item(i).items():
            acc[k] = acc.get(k, 0.0) + v
    return {k: v / B for k, v in acc.items()}
