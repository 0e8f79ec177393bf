#!/usr/bin/env python
"""Evaluate a PreWorld checkpoint: 3-D occupancy mIoU on Occ3D-nuScenes.

CLI parity with the reference `tools/test.py` (config, checkpoint, --eval),
single-process SPMD instead of torch.distributed; eval runs batched with
the batch dim sharded over all devices (the reference's distributed test
loop + rank gather, `apis/test.py:63-195`).
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
    p.add_argument("--batch-size", type=int, default=None,
                   help="eval batch (default: one sample per device)")
    p.add_argument("--out", default=None, help="dump predictions .npz dir")
    p.add_argument("--eval", nargs="+", default=["miou"],
                   choices=["miou", "mIoU", "fscore"],
                   help="metrics to compute: miou (default) and/or fscore "
                        "(chamfer F-score, reference "
                        "occ_metrics.py:322-410). mIoU always runs; fscore "
                        "adds accuracy/completeness/f1 to the results")
    p.add_argument("--fuse-conv-bn", action="store_true",
                   help="fold BN into convs before eval (reference "
                        "tools/test.py:48,220-221; exact transform)")
    p.add_argument("--no-aavt", action="store_true",
                   help="disable test-time adjacent-frame BEV alignment "
                        "(align_after_view_transformation, reference "
                        "tools/test.py:82,211). Default ON for protocol "
                        "parity; --no-aavt pools adjacent frames directly "
                        "into the key ego (exact, no resampling)")
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
    from preworld_tpu.train.evaluate import evaluate_miou
    from preworld_tpu.train.loop import maybe_resume
    from preworld_tpu.parallel import make_mesh

    if os.environ.get("JAX_COORDINATOR"):
        jax.distributed.initialize()

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    model = build_model(cfg)

    if args.synthetic:
        from preworld_tpu.data.synthetic import synthetic_batch

        n = args.num_samples or 4
        samples = [
            {k: v[0] for k, v in
             synthetic_batch(model.cfg, 1, num_rays=512, seed=i).items()}
            for i in range(n)
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
        # rank-strided shard of the val set, padded so every process runs
        # the same number of sharded predict calls (reference
        # DistributedSampler round-up, apis/test.py:63-80)
        from preworld_tpu.train.evaluate import rank_padded_indices

        samples = (
            {**dataset[i], "_valid": v} for i, v in rank_padded_indices(n)
        )

    mesh = make_mesh(n_data=len(jax.devices()), n_seq=1)
    tx = make_optimizer()

    samples = iter(samples)
    first = next(samples)

    def chain():
        yield first
        yield from samples

    state = create_train_state(
        model,
        {k: jnp.asarray(v[None]) for k, v in first.items()
         if k != "_valid"},
        tx,
        jax.random.PRNGKey(0),
    )
    if args.checkpoint:
        state, resumed = maybe_resume(state, args.checkpoint)
        logging.info("checkpoint restored: %s", resumed)

    if args.fuse_conv_bn:
        import flax

        from preworld_tpu.train import eval_params
        from preworld_tpu.utils.fold_bn import fold_conv_bn

        # fold the EVAL weights (EMA when present) and install them as both
        # copies so eval_params resolves to the folded tree either way
        p, s = fold_conv_bn(
            flax.core.unfreeze(eval_params(state)),
            flax.core.unfreeze(state.batch_stats),
        )
        state = state.replace(params=p, ema_params=p, batch_stats=s)
        logging.info("folded conv+BN pairs for eval")

    aavt = not args.no_aavt
    # BEVStereo4DOCC.predict has no align_after_vt toggle (the reference's
    # --no-aavt likewise only affects the PreWorld/BEVDet4D eval path)
    import inspect

    has_aavt = "align_after_vt" in inspect.signature(
        type(model).predict
    ).parameters

    @jax.jit
    def predict_fn(params, batch_stats, b):
        kw = {"align_after_vt": aavt} if has_aavt else {}
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, b,
            method=lambda m, bb: m.predict(bb, **kw),
        )

    dump_fn = None
    if args.out:
        os.makedirs(args.out, exist_ok=True)

        def dump_fn(i, occ):
            np.savez_compressed(
                os.path.join(args.out, f"{i:06d}.npz"), semantics=occ
            )

    fscore_metric = None
    if "fscore" in args.eval:
        from preworld_tpu.metrics import MetricFScore

        g = cfg["grid_config"]
        fscore_metric = MetricFScore(
            voxel_size=(g["x"][2], g["y"][2], g["z"][2]),
            pc_range=(g["x"][0], g["y"][0], g["z"][0],
                      g["x"][1], g["y"][1], g["z"][1]),
            void=(model.cfg.num_classes - 1, 255),
            use_image_mask=True,
        )

    results = evaluate_miou(
        model, state, chain(), mesh,
        num_classes=model.cfg.num_classes, use_image_mask=True,
        batch_size=args.batch_size, dump_fn=dump_fn,
        predict_fn=predict_fn, fscore_metric=fscore_metric,
    )
    print(results)


if __name__ == "__main__":
    main()
