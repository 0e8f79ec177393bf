#!/usr/bin/env python
"""Per-stage microbenchmarks on the real chip (dev tool).

Measures the hot stages in isolation at flagship shapes so kernel work can
be evaluated without a full forward: cost volume (XLA gather vs
corner-table), NeRF render fwd/bwd (corner-table sampling), full pretrain
train step. Prints one JSON line per stage.

Usage: python tools/bench_parts.py [cost_volume|nerf|pretrain_step|all]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=4, readback):
    fn(*args)  # compile
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


def bench_cost_volume():
    from preworld_tpu.models.depthnet import (
        stereo_cost_volume,
        stereo_cost_volume_expanded,
    )

    BN, H, W, C, D = 6, 128, 352, 128, 88
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    prev = jnp.asarray(rng.normal(size=(BN, H, W, C)), dtype=dt)
    curr = jnp.asarray(rng.normal(size=(BN, H, W, C)), dtype=dt)
    # realistic smooth warp: mild shift/scale per depth
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = np.zeros((BN, D, H, W), np.float32)
    gy = np.zeros((BN, D, H, W), np.float32)
    for d in range(D):
        shift = 30.0 / (1.0 + 0.5 * d)
        gx[:, d] = (xs + shift) / (W - 1) * 2 - 1
        gy[:, d] = (ys + 0.1 * shift) / (H - 1) * 2 - 1
    grid = jnp.asarray(
        np.stack([gx, gy], -1).reshape(BN, D * H, W, 2), dtype=dt
    )

    from preworld_tpu.models.depthnet import stereo_cost_volume_fused

    for name, fn in [
        ("xla_patch", stereo_cost_volume),
        ("corner_table", stereo_cost_volume_expanded),
        ("fused_pallas", stereo_cost_volume_fused),
    ]:
        f = jax.jit(lambda p, c, g, fn=fn: fn(p, c, g, 5.0))
        t = timeit(f, prev, curr, grid, readback=lambda o: o[0, 0, 0, 0])
        print(json.dumps({"stage": f"cost_volume_{name}", "ms": round(t * 1e3, 1)}))


def bench_nerf(backward=True):
    from preworld_tpu.models.nerf_head import NerfHeadConfig, nerf_head_losses

    cfg = NerfHeadConfig()
    rng = np.random.default_rng(0)
    B, R = 1, 38400
    X, Y, Z = 200, 200, 16
    density = jnp.asarray(rng.normal(size=(B, X, Y, Z)).astype(np.float32))
    semantic = jnp.asarray(
        rng.normal(size=(B, X, Y, Z, 17)).astype(np.float32)
    )
    color = jnp.asarray(rng.normal(size=(B, X, Y, Z, 3)).astype(np.float32))
    rays = np.zeros((B, R, 16), np.float32)
    rays[..., 2] = rng.uniform(1, 40, (B, R))  # depth
    rays[..., 3] = rng.integers(0, 17, (B, R))
    o = rng.uniform(-2, 2, (B, R, 3))
    d = rng.normal(size=(B, R, 3))
    rays[..., 4:7] = o
    rays[..., 7:10] = d
    rays[..., 13:16] = rng.uniform(0, 1, (B, R, 3))
    rays = jnp.asarray(rays)
    bda = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))

    def fwd(de, se, co):
        losses = nerf_head_losses(de, se, co, rays, bda, cfg)
        return sum(losses.values())

    f = jax.jit(fwd)
    t = timeit(f, density, semantic, color, readback=lambda o: o)
    print(json.dumps({"stage": "nerf_render_fwd", "ms": round(t * 1e3, 1)}))
    if backward:
        g = jax.jit(jax.grad(fwd, argnums=(0, 1, 2)))
        t = timeit(
            g, density, semantic, color, readback=lambda o: o[0][0, 0, 0, 0]
        )
        print(json.dumps({"stage": "nerf_render_bwd", "ms": round(t * 1e3, 1)}))


def _bench_train_step(cfg_path, name, num_rays=38400, batch=1):
    from preworld_tpu.data import synthetic_batch
    from preworld_tpu.train import create_train_state, make_optimizer, make_train_step
    from preworld_tpu.train.builder import build_model
    from preworld_tpu.utils import Config

    cfg = Config.fromfile(cfg_path)
    model = build_model(cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            model.cfg, batch, num_rays=num_rays
        ).items()
    }
    tx = make_optimizer()
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx))
    key = jax.random.PRNGKey(1)

    new_state, m = step(state, batch, key)  # compile
    _ = float(m["loss_total"])
    times = []
    for i in range(3):
        b = dict(batch)
        b["imgs"] = batch["imgs"] + np.float32(1e-6 * (i + 1))
        t0 = time.perf_counter()
        new_state, m = step(new_state, b, key)
        _ = float(m["loss_total"])
        times.append(time.perf_counter() - t0)
    print(json.dumps({"stage": name, "s": round(min(times), 2)}))


def bench_finetune_step(batch=1):
    _bench_train_step(
        "configs/preworld/preworld_7frame_finetune.py",
        f"finetune_train_step_b{batch}", batch=batch,
    )


def bench_pretrain_step(batch=1):
    _bench_train_step(
        "configs/preworld/preworld_7frame_pretrain.py",
        f"pretrain_train_step_b{batch}", batch=batch,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("which", nargs="?", default="all")
    p.add_argument("--batch", type=int, default=1,
                   help="per-chip train-step batch (B=2 probes whether the "
                        "r2 OOM is gone after the VJP/compaction memory work)")
    a = p.parse_args()
    if a.which in ("cost_volume", "all"):
        bench_cost_volume()
    if a.which in ("nerf", "all"):
        bench_nerf()
    if a.which in ("pretrain_step", "all"):
        bench_pretrain_step(a.batch)
    if a.which in ("finetune_step", "all"):
        bench_finetune_step(a.batch)
