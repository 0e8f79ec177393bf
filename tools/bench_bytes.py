#!/usr/bin/env python
"""Static bytes/FLOPs attribution of the flagship predict (dev tool).

Compiles the same cumulative-truncation probes as bench_stages.py and reads
XLA cost analysis (flops, bytes accessed) from each compiled executable;
successive differences attribute HBM traffic to stages. Compile-only (no
execution), so it is immune to relay timing flakiness — use bench_stages.py
for wall-clock truth and this for the bandwidth budget (VERDICT r2 #2: cut
226 GB/fwd to <100 GB).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", ".jax_cache"),
)


def cost(fn, variables, batch):
    compiled = jax.jit(fn).lower(variables, batch).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    from tools.bench_stages import make_probes

    variables, batch, probes = make_probes()
    prev_f, prev_b = 0.0, 0.0
    for name, fn in probes:
        f, b = cost(fn, variables, batch)
        print(
            json.dumps(
                {
                    "probe": name,
                    "gb": round(b / 1e9, 1),
                    "delta_gb": round((b - prev_b) / 1e9, 1),
                    "tflops": round(f / 1e12, 2),
                    "delta_tflops": round((f - prev_f) / 1e12, 2),
                }
            ),
            flush=True,
        )
        prev_f, prev_b = f, b


if __name__ == "__main__":
    main()
