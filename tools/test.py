#!/usr/bin/env python
"""Evaluate a PreWorld checkpoint: 3-D occupancy mIoU on Occ3D-nuScenes.

CLI parity with the reference `tools/test.py` (config, checkpoint, --eval),
single-process SPMD instead of torch.distributed.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Test PreWorld (TPU)")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="work_dir with checkpoints/ (orbax) or empty for "
                        "random weights (smoke)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--out", default=None, help="dump predictions .npz dir")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from preworld_tpu.utils import Config
    from preworld_tpu.train.builder import build_model
    from preworld_tpu.train import create_train_state, make_optimizer
    from preworld_tpu.train.loop import maybe_resume
    from preworld_tpu.metrics import MetricMIoU

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    model = build_model(cfg)

    if args.synthetic:
        from preworld_tpu.data.synthetic import synthetic_batch

        n = args.num_samples or 4
        samples = [
            synthetic_batch(model.cfg, 1, num_rays=512, seed=i) for i in range(n)
        ]
    else:
        from preworld_tpu.data.nuscenes import NuScenesOccDataset

        data_cfg = cfg.get("data", {})
        dataset = NuScenesOccDataset(
            ann_file=data_cfg["val"]["ann_file"],
            data_config=cfg["data_config"],
            grid_config=cfg["grid_config"],
            is_train=False,
            data_root=data_cfg.get("data_root", ""),
        )
        n = args.num_samples or len(dataset)
        samples = (dataset[i] for i in range(n))
        samples = (
            {k: v[None] for k, v in s.items()} for s in samples
        )

    tx = make_optimizer()
    first = None
    metric = MetricMIoU(num_classes=18, use_image_mask=True)

    state = None
    predict_jit = None
    preds = []
    for i, sample in enumerate(samples):
        batch = {k: jnp.asarray(v) for k, v in sample.items()}
        infer = {
            k: v for k, v in batch.items()
            if k in ("imgs", "sensor2egos", "ego2globals", "intrins",
                     "post_rots", "post_trans", "bda")
        }
        if state is None:
            state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
            if args.checkpoint:
                state, resumed = maybe_resume(state, args.checkpoint)
                logging.info("checkpoint restored: %s", resumed)

            @jax.jit
            def predict_jit(params, batch_stats, b):
                return model.apply(
                    {"params": params, "batch_stats": batch_stats}, b,
                    train=False,
                )

        out = predict_jit(state.ema_params, state.batch_stats, infer)
        occ = np.asarray(out["semantic_occ"][0])
        preds.append(occ)
        if "voxel_semantics" in sample:
            metric.add_batch(
                occ,
                sample["voxel_semantics"][0],
                sample.get("mask_lidar", [None])[0],
                sample.get("mask_camera", [None])[0],
            )
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            np.savez_compressed(
                os.path.join(args.out, f"{i:06d}.npz"), semantics=occ
            )

    results = metric.count_miou()
    print(results)


if __name__ == "__main__":
    main()
