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
    p.add_argument("--resume-from", default=None,
                   help="explicit checkpoint/work_dir to resume optimizer "
                        "state from (reference tools/train.py:148-156)")
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--load-from", default=None,
                   help="warm-start params overlay (.pkl from "
                        "tools/convert_torch_checkpoint.py); mmcv "
                        "load_from strict=False parity "
                        "(reference bevstereo-occ.py:257)")
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
    import flax
    import jax
    import jax.numpy as jnp

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
    # global batch = samples_per_device x data-parallel extent (devices not
    # on the data axis serve sequence parallelism, not batch)
    n_seq = int(cfg.get("parallel", {}).get("n_seq", 1))
    batch_size = int(data_cfg.get("samples_per_gpu", 1)) * max(
        1, len(jax.devices()) // n_seq
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
        tr = data_cfg.get("train", {})
        common = dict(
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
        if cfg["model"].get("type") == "PreWorld4DTraj":
            # 4D-traj training feeds forward_train from the trajectory
            # dataset (reference nuscenes_dataset_occ_trajectory.py:388-476)
            from preworld_tpu.data.nuscenes_traj import NuScenesOccTrajDataset

            dataset = NuScenesOccTrajDataset(
                ego_gt_path=tr.get("ego_gt_path"),
                traj_gt_path=tr.get("traj_gt_path"),
                **common,
            )
        else:
            from preworld_tpu.data.nuscenes import NuScenesOccDataset

            dataset = NuScenesOccDataset(**common)

    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        num_workers=int(data_cfg.get("workers_per_gpu", 2)) * 2,
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev // n_seq, n_seq=n_seq)
    example = next(iter(loader))
    state = create_train_state(
        model,
        {k: jnp.asarray(v) for k, v in example.items()},
        tx,
        jax.random.PRNGKey(args.seed),
        init_ema_updates=int(cfg.get("ema", {}).get("init_updates", 0)),
    )
    state = jax.device_put(state, replicate_sharding(mesh))

    load_from = args.load_from or cfg.get("load_from")
    if load_from:
        # mmcv load_from strict=False parity (reference apis/train.py:308-318
        # + bevstereo-occ.py:257): overlay the ported torch tensors over the
        # fresh init; heads absent from the source keep their init. The EMA
        # copy gets the same overlay so EMA starts from the warm weights.
        import pickle

        from preworld_tpu.utils.torch_port import merge_trees

        with open(load_from, "rb") as fh:
            ported = pickle.load(fh)
        params = merge_trees(
            flax.core.unfreeze(state.params), ported["params"]
        )
        stats = merge_trees(
            flax.core.unfreeze(state.batch_stats), ported.get("batch_stats", {})
        )
        state = state.replace(
            params=params, ema_params=params, batch_stats=stats
        )
        logging.info("warm-started from %s", load_from)

    if args.auto_resume or args.resume_from:
        state, resumed = maybe_resume(state, work_dir, args.resume_from)
        if resumed:
            logging.info("resumed from checkpoint at step %d", int(state.step))

    max_epochs = args.epochs or int(cfg.get("runner", {}).get("max_epochs", 12))

    step_factory = None
    ema_decay = float(cfg.get("ema", {}).get("decay", 0.999))
    train_step = make_train_step(model, tx, ema_decay=ema_decay, mesh=mesh)
    if cfg["model"].get("type") == "PreWorld4DTraj":
        # rollout-length curriculum (`preworld_temporal_traj.py:440-449`)
        from functools import lru_cache

        from preworld_tpu.models import rollout_curriculum

        @lru_cache(maxsize=8)
        def _step_for(n_future):
            return make_train_step(
                model, tx, ema_decay=ema_decay, num_future=n_future,
                mesh=mesh,
            )

        def step_factory(epoch):
            return _step_for(rollout_curriculum(epoch, model.cfg.if_render))

        train_step = None

    eval_fn = None
    if args.validate:
        from preworld_tpu.train.evaluate import evaluate_miou

        rank, world = jax.process_index(), jax.process_count()
        if args.synthetic:
            val_samples = [
                dataset[i]
                for i in range(rank, min(args.val_samples, len(dataset)), world)
            ]
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
                for i in range(rank, min(args.val_samples, len(val_dataset)),
                               world)
            ]

        def eval_fn(st):
            return evaluate_miou(
                model, st, val_samples, mesh,
                num_classes=model.cfg.num_classes, use_image_mask=True,
            )

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
