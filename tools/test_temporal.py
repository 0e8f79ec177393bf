#!/usr/bin/env python
"""Evaluate 4-D occupancy forecasting (temporal mIoU at 0/1/2/3 s).

CLI parity with the reference `tools/test_temporal.py`: rolls the model out
6 future steps per sample and scores against GT at +{0, 2, 4, 6} frames
(<-> 0/1/2/3 s) with the unmasked temporal mIoU protocol.

Pred-to-horizon mapping (--protocol):
  reference (default): rollout steps {0, 1, 3, 5}. The reference writes
    rollout step k under key `semantic_occ_{k+1}s` at inference
    (`preworld_temporal_traj.py:297` — future_interval = ego_interval + 2),
    stacks keys {0,2,4,6}s (`apis/test.py:218-223`) and scores GT at
    +{0,2,4,6} frames against stack position idx//2 (`occ_metrics.py:512`)
    — so the published 9.55 compares rollout steps {1,3,5} to 1/2/3 s GT.
  aligned: rollout steps {0, 2, 4, 6} — step k is trained against +k-frame
    GT (0.5 s keyframes), so this scores each horizon with the step trained
    for it. NOT comparable to the reference's published numbers.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Test PreWorld4DTraj (TPU)")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--protocol", choices=("reference", "aligned"),
                   default="reference",
                   help="horizon->rollout-step mapping (see module docstring)")
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
    from preworld_tpu.models.preworld_traj import PreWorld4DTraj
    from preworld_tpu.parallel import make_mesh
    from preworld_tpu.train import create_train_state, make_optimizer
    from preworld_tpu.train.evaluate import (
        evaluate_miou_temporal,
        rank_padded_indices,
    )
    from preworld_tpu.train.loop import maybe_resume

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    base = build_model(cfg)
    model = PreWorld4DTraj(base.cfg)

    # rank-strided + padded to equal per-process length: unequal batch
    # counts would deadlock the sharded predict (see rank_padded_indices)
    if args.synthetic:
        from preworld_tpu.data.synthetic import synthetic_batch

        n = args.num_samples or 2

        def sample_iter():
            for i, v in rank_padded_indices(n):
                s = synthetic_batch(base.cfg, 1, 256, seed=i, with_traj=True)
                out = {k: v2[0] for k, v2 in s.items()}
                out["_valid"] = v
                for h, f in zip((0, 1, 2, 3), (0, 2, 4, 6)):
                    out[f"gt_h{h}"] = (
                        s["temporal_semantics"][0, f - 1] if f > 0
                        else s["voxel_semantics"][0]
                    )
                yield out
        samples = sample_iter()
    else:
        from preworld_tpu.data.nuscenes_traj import NuScenesOccTrajDataset

        data_cfg = cfg.get("data", {})
        val = data_cfg.get("val", {})
        dataset = NuScenesOccTrajDataset(
            ann_file=val["ann_file"],
            data_config=cfg["data_config"],
            grid_config=cfg["grid_config"],
            is_train=False,
            data_root=data_cfg.get("data_root", ""),
            ego_gt_path=val.get("ego_gt_path"),
            traj_gt_path=val.get("traj_gt_path"),
        )
        n = args.num_samples or len(dataset)

        def sample_iter():
            from preworld_tpu.data.pipeline import load_occ_gt

            for i, v in rank_padded_indices(n):
                s = dict(dataset[i])
                s["_valid"] = v
                index = dataset.temp2nusc_map[i]
                for h, f in zip((0, 1, 2, 3), (0, 2, 4, 6)):
                    finfo = dataset.infos[
                        min(index + f, len(dataset.infos) - 1)
                    ]
                    s[f"gt_h{h}"] = load_occ_gt(
                        dataset._data_path(finfo["occ_path"])
                    )["voxel_semantics"]
                yield s
        samples = sample_iter()

    tx = make_optimizer()
    mesh = make_mesh(n_data=len(jax.devices()), n_seq=1)

    from preworld_tpu.data.synthetic import synthetic_batch as _sb

    init_batch = {
        k: jnp.asarray(v)
        for k, v in _sb(base.cfg, 1, 256, with_traj=True).items()
    }
    state = create_train_state(model, init_batch, tx, jax.random.PRNGKey(0))
    if args.checkpoint:
        state, resumed = maybe_resume(state, args.checkpoint)
        logging.info("checkpoint restored: %s", resumed)

    steps = (0, 1, 3, 5) if args.protocol == "reference" else (0, 2, 4, 6)
    print(evaluate_miou_temporal(
        model, state, samples, mesh, rollout_steps=steps,
        num_classes=base.cfg.num_classes,
    ))


if __name__ == "__main__":
    main()
