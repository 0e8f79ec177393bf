#!/usr/bin/env python
"""Cumulative-truncation breakdown of the flagship predict (dev tool).

Times jitted prefixes of the forward (encoders only -> + view transformer
-> full voxel feats -> full predict); successive differences attribute time
to image encoding, cost-volume/depth/pool, BEV encoder, and heads. This is
relay-proof where an XLA profile is not, and honest where r1's attribution
(from partial-model timings at different shapes) proved wrong.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, variables, batch, n=3):
    out = fn(variables, batch)
    _ = float(np.asarray(out))
    ts = []
    for i in range(n):
        b2 = dict(batch)
        b2["imgs"] = batch["imgs"] + np.float32(1e-6 * (i + 1))
        _ = float(np.asarray(b2["imgs"].reshape(-1)[0]))
        t0 = time.perf_counter()
        out = fn(variables, b2)
        _ = float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_probes():
    """Build (variables, batch, [(name, fn(variables, batch))]) for the
    cumulative-truncation probes; shared with bench_bytes.py."""
    from preworld_tpu.data import synthetic_batch
    from preworld_tpu.models import PreWorld, PreWorldConfig
    from preworld_tpu.geometry.transforms import (
        curr2adjsensor_chain,
        sensor2keyego_chain,
    )
    from preworld_tpu.models.view_transformer import get_mlp_input

    cfg = PreWorldConfig(if_post_finetune=True, if_render=False,
                         use_lss_depth_loss=False, dtype=jnp.bfloat16)
    model = PreWorld(cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, 1, with_labels=False).items()
    }
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=False,
        )
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(0)
    vals = [
        jax.random.normal(jax.random.fold_in(key, i), s.shape, s.dtype) * 0.02
        if np.issubdtype(s.dtype, np.floating)
        else jnp.zeros(s.shape, s.dtype)
        for i, s in enumerate(leaves)
    ]
    variables = jax.tree_util.tree_unflatten(treedef, vals)

    def frame_loop(m, batch, with_vt, with_bev, with_cost=True):
        c = m.cfg
        imgs = batch["imgs"]
        B, T, N = imgs.shape[:3]
        s2keyego = sensor2keyego_chain(batch["sensor2egos"],
                                       batch["ego2globals"])
        curr2adj = curr2adjsensor_chain(batch["sensor2egos"],
                                        batch["ego2globals"],
                                        c.temporal_frames)
        stereo_feat_prev = None
        bev_feats = []
        acc = jnp.float32(0)
        for fid in range(c.num_frames - 1, -1, -1):
            frame_imgs = imgs[:, fid]
            if fid >= c.temporal_frames:
                x = frame_imgs.reshape(B * N, *frame_imgs.shape[2:])
                stereo_feat_prev = m.img_backbone(x, False, True)[0]
                continue
            feat, stereo_feat = m._encode_image(frame_imgs, False)
            if not with_vt:
                acc += feat.astype(jnp.float32).sum()
                acc += stereo_feat.astype(jnp.float32)[0, 0, 0, 0]
                stereo_feat_prev = stereo_feat
                continue
            cams = {
                "sensor2keyego": s2keyego[:, fid],
                "intrin": batch["intrins"][:, fid],
                "post_rot": batch["post_rots"][:, fid],
                "post_tran": batch["post_trans"][:, fid],
                "bda": batch["bda"],
                "mlp_input": get_mlp_input(
                    s2keyego[:, 0], batch["ego2globals"][:, 0],
                    batch["intrins"][:, fid], batch["post_rots"][:, fid],
                    batch["post_trans"][:, fid], batch["bda"],
                ),
            }
            stereo = {
                "prev_feat": stereo_feat_prev if with_cost else None,
                "curr_feat": stereo_feat,
                "k2s_sensor": curr2adj[:, fid],
            }
            voxel, depth = m.view_transformer(feat, cams, stereo, False)
            voxel = m.pre_process_net(voxel, False)[0]
            bev_feats.append(voxel)
            stereo_feat_prev = stereo_feat
        if not with_vt:
            return acc
        x = jnp.concatenate(bev_feats, axis=-1)
        if not with_bev:
            return x.astype(jnp.float32).sum()
        feats = m.bev_backbone(x, False)
        x = m.bev_neck(feats, train=False)
        x = m.final_conv(x.astype(jnp.float32), train=False)
        return x.sum()

    probes = [
        ("encode_3frames", lambda m, b: frame_loop(m, b, False, False)),
        ("plus_vt_zerocost", lambda m, b: frame_loop(m, b, True, False, False)),
        ("plus_viewtransform", lambda m, b: frame_loop(m, b, True, False)),
        ("plus_bev_encoder", lambda m, b: frame_loop(m, b, True, True)),
        ("full_predict",
         lambda m, b: m.predict(b)["semantic_occ"].sum().astype(jnp.float32)),
    ]
    probes = [
        (name, lambda v, b, fn=fn: model.apply(v, b, method=fn))
        for name, fn in probes
    ]
    return variables, batch, probes


def main():
    variables, batch, probes = make_probes()
    prev = 0.0
    for name, fn in probes:
        f = jax.jit(fn)
        t = timeit(f, variables, batch)
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 1),
                          "delta_ms": round((t - prev) * 1e3, 1)}), flush=True)
        prev = t


if __name__ == "__main__":
    main()
