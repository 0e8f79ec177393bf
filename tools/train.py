#!/usr/bin/env python
"""Train a PreWorld model from a config file.

CLI surface parity with the reference `tools/train.py` (config path,
--work-dir, --resume-from/--auto-resume, --cfg-options, --seed), minus the
torch.distributed launcher flags: SPMD scale-out comes from the jax mesh
(single process drives all local chips; multi-host via
`jax.distributed.initialize` when JAX_COORDINATOR is set).

Use --synthetic to run on generated data (smoke tests / perf shakeout) when
the nuScenes files are not present.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train PreWorld (TPU)")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--validate", action="store_true",
                   help="run mIoU eval after each epoch (reference EvalHook)")
    p.add_argument("--val-samples", type=int, default=64)
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic data (no nuScenes needed)")
    p.add_argument("--max-iters", type=int, default=None,
                   help="cap iterations per epoch (debug)")
    p.add_argument("--profile-dir", default=None,
                   help="capture an XLA device trace of a few steady iters")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument(
        "--cfg-options", nargs="+", default=[],
        help="override config entries, e.g. model.out_dim=64",
    )
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(message)s"
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    from preworld_tpu.utils import Config
    from preworld_tpu.train.builder import build_model
    from preworld_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )
    from preworld_tpu.train.loop import maybe_resume, train_epochs
    from preworld_tpu.parallel import make_mesh, shard_batch, replicate_sharding
    from preworld_tpu.data.loader import DataLoader

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0]
    )

    if os.environ.get("JAX_COORDINATOR"):
        jax.distributed.initialize()

    model = build_model(cfg)
    opt = cfg.get("optimizer", {})
    lr_cfg = cfg.get("lr_config", {})
    tx = make_optimizer(
        base_lr=float(opt.get("lr", 1e-4)),
        weight_decay=float(opt.get("weight_decay", 1e-2)),
        clip_norm=float(
            cfg.get("optimizer_config", {}).get("grad_clip", {}).get("max_norm", 5)
        ),
        warmup_iters=int(lr_cfg.get("warmup_iters", 200)),
    )

    data_cfg = cfg.get("data", {})
    batch_size = int(data_cfg.get("samples_per_gpu", 1)) * max(
        1, len(jax.devices())
    )

    if args.synthetic:
        from preworld_tpu.data.synthetic import synthetic_batch

        class SyntheticDataset:
            def __init__(self, model_cfg, n=64):
                self.n = n
                self.model_cfg = model_cfg

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                n_rays = int(
                    data_cfg.get("train", {}).get("max_ray_nums", 4096)
                ) or 4096
                b = synthetic_batch(
                    self.model_cfg, 1, num_rays=n_rays, seed=i,
                    with_traj=cfg["model"].get("type") == "PreWorld4DTraj",
                )
                return {k: v[0] for k, v in b.items()}

        dataset = SyntheticDataset(model.cfg)
    else:
        from preworld_tpu.data.nuscenes import NuScenesOccDataset

        tr = data_cfg.get("train", {})
        dataset = NuScenesOccDataset(
            ann_file=tr["ann_file"],
            data_config=cfg["data_config"],
            grid_config=cfg["grid_config"],
            bda_aug_conf=cfg.get("bda_aug_conf"),
            is_train=True,
            use_rays=bool(tr.get("use_rays", False)),
            aux_frames=tr.get("aux_frames", (-3, -2, -1, 1, 2, 3)),
            max_ray_nums=int(tr.get("max_ray_nums", 38400)),
            depth_gt_path=tr.get("depth_gt_path"),
            semantic_gt_path=tr.get("semantic_gt_path"),
            data_root=data_cfg.get("data_root", ""),
        )

    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        num_workers=int(data_cfg.get("workers_per_gpu", 2)) * 2,
        seed=args.seed,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev, n_seq=1)
    example = next(iter(loader))
    state = create_train_state(
        model,
        {k: jnp.asarray(v) for k, v in example.items()},
        tx,
        jax.random.PRNGKey(args.seed),
        init_ema_updates=int(cfg.get("ema", {}).get("init_updates", 0)),
    )
    state = jax.device_put(state, replicate_sharding(mesh))

    if args.auto_resume or args.resume_from:
        state, resumed = maybe_resume(state, work_dir)
        if resumed:
            logging.info("resumed from checkpoint at step %d", int(state.step))

    max_epochs = args.epochs or int(cfg.get("runner", {}).get("max_epochs", 12))

    step_factory = None
    train_step = make_train_step(model, tx)
    if cfg["model"].get("type") == "PreWorld4DTraj":
        # rollout-length curriculum (`preworld_temporal_traj.py:440-449`)
        from functools import lru_cache

        from preworld_tpu.models import rollout_curriculum

        @lru_cache(maxsize=8)
        def _step_for(n_future):
            return make_train_step(model, tx, num_future=n_future)

        def step_factory(epoch):
            return _step_for(rollout_curriculum(epoch, model.cfg.if_render))

        train_step = None

    eval_fn = None
    if args.validate:
        from preworld_tpu.metrics import MetricMIoU

        if args.synthetic:
            val_samples = [
                dataset[i] for i in range(min(args.val_samples, len(dataset)))
            ]
            val_dataset = None
        else:
            from preworld_tpu.data.nuscenes import NuScenesOccDataset

            val_dataset = NuScenesOccDataset(
                ann_file=data_cfg["val"]["ann_file"],
                data_config=cfg["data_config"],
                grid_config=cfg["grid_config"],
                is_train=False,
                data_root=data_cfg.get("data_root", ""),
            )
            val_samples = [
                val_dataset[i]
                for i in range(min(args.val_samples, len(val_dataset)))
            ]

        infer_keys = ("imgs", "sensor2egos", "ego2globals", "intrins",
                      "post_rots", "post_trans", "bda")

        @jax.jit
        def _predict(params, batch_stats, b):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, b, train=False
            )

        def eval_fn(st):
            metric = MetricMIoU(
                num_classes=model.cfg.num_classes, use_image_mask=True
            )
            for s in val_samples:
                b = {
                    k: jnp.asarray(v[None]) for k, v in s.items()
                    if k in infer_keys
                }
                b["bda"] = jnp.asarray(s["bda"][None])
                out = _predict(st.ema_params, st.batch_stats, b)
                if "voxel_semantics" in s:
                    metric.add_batch(
                        np.asarray(out["semantic_occ"][0]),
                        s["voxel_semantics"],
                        mask_camera=s.get("mask_camera"),
                    )
            return metric.count_miou()

    train_epochs(
        state,
        train_step,
        loader,
        max_epochs=max_epochs,
        work_dir=work_dir,
        shard_fn=lambda b: shard_batch(mesh, b),
        log_interval=int(cfg.get("log_interval", 50)),
        rng=jax.random.PRNGKey(args.seed + 1),
        step_factory=step_factory,
        max_iters_per_epoch=args.max_iters,
        eval_fn=eval_fn,
        profile_dir=args.profile_dir,
    )


if __name__ == "__main__":
    main()
