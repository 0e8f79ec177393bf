#!/usr/bin/env python
"""Swin backbone microbenchmarks at flagship scale (dev tool).

Times the full Swin-B forward (6 cams, 512x1408, bf16), the stage0-only
stereo path, and isolated blocks at each stage's scale so layout/attention
work can be targeted. One JSON line per probe. Inputs are varied between
timed iterations (the axon relay dedupes identical executions).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, variables, x, n=4):
    o = fn(variables, x)
    _ = float(np.asarray(o.reshape(-1)[0]))
    ts = []
    for i in range(n):
        x2 = x + np.float32(1e-6 * (i + 1))
        _ = float(np.asarray(x2.reshape(-1)[0]))  # finish the bump
        t0 = time.perf_counter()
        o = fn(variables, x2)
        _ = float(np.asarray(o.reshape(-1)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from preworld_tpu.models.swin import SwinBlock, SwinTransformer

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    B, H, W = 6, 512, 1408
    imgs = jnp.asarray(rng.normal(size=(B, H, W, 3)), dtype=dt)

    model = SwinTransformer(dtype=dt)
    vars_ = model.init(jax.random.PRNGKey(0), imgs[:1], False, False)

    f = jax.jit(lambda v, x: model.apply(v, x, False, False)[0])
    t = timeit(f, vars_, imgs)
    print(json.dumps({"probe": "swin_full_6cam", "ms": round(t * 1e3, 1)}),
          flush=True)

    f0 = jax.jit(lambda v, x: model.apply(v, x, False, True)[0])
    t = timeit(f0, vars_, imgs)
    print(json.dumps({"probe": "swin_stage0_6cam", "ms": round(t * 1e3, 1)}),
          flush=True)

    stage_dims = [(128, (128, 352), 4), (256, (64, 176), 8),
                  (512, (32, 88), 16), (1024, (16, 44), 32)]
    for i, (C, hw, heads) in enumerate(stage_dims):
        blk = SwinBlock(C, heads, 12, shift=False, dtype=dt)
        x = jnp.asarray(rng.normal(size=(B, hw[0] * hw[1], C)), dtype=dt)
        bv = blk.init(jax.random.PRNGKey(i), x, hw, False)
        fb = jax.jit(lambda v, x, blk=blk, hw=hw: blk.apply(v, x, hw, False))
        t = timeit(fb, bv, x)
        print(json.dumps(
            {"probe": f"swin_block_stage{i}", "ms": round(t * 1e3, 2)}
        ), flush=True)


if __name__ == "__main__":
    main()
