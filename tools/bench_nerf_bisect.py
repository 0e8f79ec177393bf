#!/usr/bin/env python
"""Per-term bisection of the NeRF render backward (dev tool).

The pretrain step's dominant term is the render gradient (fwd ~347 ms,
total grad ~1136 ms vs a ~320 ms scatter floor at flagship scale —
docs/ROUND3_STATUS.md). This tool attributes the backward:

  * scatter_only       — the corner8 scatter+fold at full 16M points
                         (the custom-VJP floor)
  * grad_base          — grad of the full loss sum (what training pays)
  * grad_no_<term>     — grad with ONE loss term's weight zeroed; XLA
                         DCEs that term's backward, so base - no_term is
                         the term's marginal backward cost
  * grad_trained_regime— same grad_base but with a density offset that
                         produces realistic early exit (~5% live
                         samples), with and without bwd_live_cap

All timings use varied inputs + scalar readback (relay dedup discipline)
and chain through jit; single numbers carry the ~25 ms relay constant,
so compare deltas, not absolutes.

Usage: python tools/bench_nerf_bisect.py [--quick]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3, readback=lambda o: o):
    fn(*args)
    _ = float(np.asarray(readback(fn(*args))))
    times = []
    for i in range(n):
        a2 = jax.tree_util.tree_map(
            lambda a: a + np.float32(1e-6 * (i + 1))
            if hasattr(a, "dtype") and a.dtype in (jnp.float32, jnp.bfloat16)
            else a,
            args,
        )
        t0 = time.perf_counter()
        out = fn(*a2)
        _ = float(np.asarray(readback(out)))
        times.append(time.perf_counter() - t0)
    return min(times)


def make_inputs(density_shift=0.0, seed=0, scene=None):
    """scene=None: random density + shift (the r3 fixtures — NOTE a uniform
    density_shift=14 'opaque regime' keeps alpha ~1 at EVERY sample, so the
    transmittance chain makes the density cotangent dense along whole rays;
    no real scene looks like that). scene='wall': mostly-empty space
    (alpha << fast_color_thres) with opaque walls + ground — the realistic
    trained regime where live cotangents are sparse, contiguous spans."""
    rng = np.random.default_rng(seed)
    B, R = 1, 38400
    X, Y, Z = 200, 200, 16
    if scene == "wall":
        d = np.full((B, X, Y, Z), -30.0, np.float32)
        d[:, :, :, :2] = 14.0  # ground plane
        d[:, 118:123, :, :] = 14.0  # wall slab
        d[:, :, 60:64, :] = 14.0  # cross wall
        density = jnp.asarray(d + rng.normal(size=d.shape).astype(np.float32))
    else:
        density = jnp.asarray(
            rng.normal(size=(B, X, Y, Z)).astype(np.float32) + density_shift
        )
    semantic = jnp.asarray(rng.normal(size=(B, X, Y, Z, 17)).astype(np.float32))
    color = jnp.asarray(rng.normal(size=(B, X, Y, Z, 3)).astype(np.float32))
    rays = np.zeros((B, R, 16), np.float32)
    rays[..., 2] = rng.uniform(1, 40, (B, R))
    rays[..., 3] = rng.integers(0, 17, (B, R))
    rays[..., 4:7] = rng.uniform(-2, 2, (B, R, 3))
    rays[..., 7:10] = rng.normal(size=(B, R, 3))
    rays[..., 13:16] = rng.uniform(0, 1, (B, R, 3))
    bda = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    return density, semantic, color, jnp.asarray(rays), bda


def grad_time(cfg, inputs, n=3):
    from preworld_tpu.models.nerf_head import nerf_head_losses

    density, semantic, color, rays, bda = inputs

    def fwd(de, se, co):
        return sum(nerf_head_losses(de, se, co, rays, bda, cfg).values())

    g = jax.jit(jax.grad(fwd, argnums=(0, 1, 2)))
    return timeit(
        g, density, semantic, color, n=n, readback=lambda o: o[0][0, 0, 0, 0]
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    a = ap.parse_args()
    n = 2 if a.quick else 3

    from preworld_tpu.models.nerf_head import NerfHeadConfig
    from preworld_tpu.ops.field_sample import _corner8_scatter_grad

    # --- scatter floor ---------------------------------------------------
    R, S, C = 38400, 417, 21
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (R, S, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(R, S, C)).astype(np.float32))
    scat = jax.jit(
        lambda p, gg: _corner8_scatter_grad((200, 200, 16, C), (200, 200, 16), p, gg)
    )
    t = timeit(scat, pts, g, n=n, readback=lambda o: o[0, 0, 0, 0])
    print(json.dumps({"stage": "scatter_only_full", "ms": round(t * 1e3, 1)}))

    # scatter with ~5% live cotangents + live_cap compaction
    live = jnp.asarray(rng.uniform(size=(R, S, 1)) < 0.05)  # bool
    g_sparse = g * live
    # the vary-inputs perturbation must NOT resurrect dead cotangents
    # (g + 1e-6 would make every sample live and silently time the full-
    # scatter branch) — re-mask inside the jitted fn so sparsity survives.
    # The mask is an explicit BOOL argument (timeit only perturbs f32/bf16,
    # so it survives vary-inputs; closing over it would embed a ~64 MB jit
    # constant — the relay's HTTP 413 failure mode, see CLAUDE.md)
    scat_cap = jax.jit(
        lambda p, gg, lv: _corner8_scatter_grad(
            (200, 200, 16, C), (200, 200, 16), p, gg * lv, live_cap=64
        )
    )
    t = timeit(
        scat_cap, pts, g_sparse, live, n=n, readback=lambda o: o[0, 0, 0, 0]
    )
    print(json.dumps({"stage": "scatter_cap64_5pct", "ms": round(t * 1e3, 1)}))

    # --- per-term grad bisection (transparent regime: all samples live) --
    base_cfg = NerfHeadConfig()
    inputs = make_inputs()
    t_base = grad_time(base_cfg, inputs, n=n)
    print(json.dumps({"stage": "grad_base", "ms": round(t_base * 1e3, 1)}))

    for term, patch in [
        ("depth", {"use_depth_sup": False}),
        ("semantic", {"weight_semantic": 0.0}),
        ("color", {"weight_color": 0.0}),
        ("entropy", {"weight_entropy_last": 0.0}),
        ("distortion", {"weight_distortion": 0.0}),
    ]:
        cfg = dataclasses.replace(base_cfg, **patch)
        t = grad_time(cfg, inputs, n=n)
        print(
            json.dumps(
                {
                    "stage": f"grad_no_{term}",
                    "ms": round(t * 1e3, 1),
                    "marginal_ms": round((t_base - t) * 1e3, 1),
                }
            )
        )

    # --- trained regime: opaque surfaces -> early exit -> sparse live ----
    inputs_tr = make_inputs(density_shift=14.0)
    for cap in (0, 64, 128):
        cfg = dataclasses.replace(base_cfg, bwd_live_cap=cap)
        t = grad_time(cfg, inputs_tr, n=n)
        print(
            json.dumps(
                {"stage": f"grad_trained_cap{cap}", "ms": round(t * 1e3, 1)}
            )
        )


if __name__ == "__main__":
    main()
