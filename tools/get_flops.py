#!/usr/bin/env python
"""Report FLOPs + parameter counts of a configured model.

Counterpart of the reference `tools/get_flops.py` (mmengine complexity
counter); here XLA's own cost analysis on the compiled forward gives the
exact executed FLOPs — more faithful than per-module counting.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from preworld_tpu.utils import Config
    from preworld_tpu.train.builder import build_model
    from preworld_tpu.data.synthetic import synthetic_batch

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    model = build_model(cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(model.cfg, 1, with_labels=False).items()
    }
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=False,
        )
    )
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes["params"])
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )

    lowered = jax.jit(
        lambda v, b: model.apply(v, b, train=False)
    ).lower(variables, batch)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    flops = analysis.get("flops", float("nan"))
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops: {flops / 1e9:.2f} GFLOPs (XLA cost analysis)")
    for k in ("bytes accessed", "transcendentals"):
        if k in analysis:
            print(f"{k}: {analysis[k]:.3e}")


if __name__ == "__main__":
    main()
