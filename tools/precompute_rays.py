#!/usr/bin/env python
"""Precompute per-image ray supervision records (offline, run once).

The reference rebuilds every ray record per `__getitem__` from 84 files
(`mmdet3d/datasets/nuscenes_dataset_occ.py:197-270`) — 7 frames x 6 cams x
(sparse depth .bin + lidarseg .bin + full-res JPEG decode). This tool bakes
each image's records ONCE, in the global frame (key-frame-agnostic, so
adjacent samples share aux-frame caches); the dataset's `ray_cache_path`
fast path then only applies the key-ego rigid transform + WRS per sample.

Output: OUT_DIR/<image_basename>.npz with key 'rays' (M, 13) float32:
  [u, v, depth, seg, origin_global(3), dir_global(3), rgb_imagenet(3)]

Usage:
  python tools/precompute_rays.py ANN.pkl --depth-gt-path D --semantic-gt-path S \
      --out-dir rays_cache [--data-root R] [--workers 16]
"""

import argparse
import os
import pickle
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("ann_file")
    p.add_argument("--depth-gt-path", required=True)
    p.add_argument("--semantic-gt-path", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--data-root", default="")
    p.add_argument("--workers", type=int, default=16)
    return p.parse_args()


def main():
    args = parse_args()
    from preworld_tpu.data.pipeline import (
        imagenet_normalize_01,
        load_seg_map,
        load_sparse_depth,
        pose_to_mat,
    )
    from preworld_tpu.geometry.rays import build_image_ray_cache

    with open(args.ann_file, "rb") as f:
        infos = pickle.load(f)["infos"]
    os.makedirs(args.out_dir, exist_ok=True)

    jobs = {}
    for info in infos:
        for cam, c in info["cams"].items():
            path = c["data_path"]
            if not os.path.isabs(path) and args.data_root:
                path = os.path.join(args.data_root, path)
            jobs.setdefault(os.path.basename(path), (path, c))

    def one(item):
        name, (path, c) = item
        out = os.path.join(args.out_dir, name + ".npz")
        if os.path.exists(out):
            return 0
        coor, depth = load_sparse_depth(path, args.depth_gt_path)
        seg_map = load_seg_map(path, args.semantic_gt_path)
        seg = seg_map[coor[:, 1], coor[:, 0]]
        img01 = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        rgb = imagenet_normalize_01(img01)[coor[:, 1], coor[:, 0]]
        s2e = pose_to_mat(c["sensor2ego_rotation"], c["sensor2ego_translation"])
        e2g = pose_to_mat(c["ego2global_rotation"], c["ego2global_translation"])
        rays = build_image_ray_cache(
            coor.astype(np.float32), depth, seg, rgb,
            np.asarray(c["cam_intrinsic"], np.float32),
            (e2g @ s2e).astype(np.float32),
        )
        np.savez_compressed(out, rays=rays)
        return 1

    with ThreadPoolExecutor(args.workers) as pool:
        done = sum(pool.map(one, jobs.items()))
    print(f"wrote {done} new caches ({len(jobs)} images) -> {args.out_dir}")


if __name__ == "__main__":
    main()
