#!/usr/bin/env python
"""Project lidarseg labels into each camera -> per-image `.bin` of
(u, v, label) float32 triplets.

Counterpart of `tools/gen_data/gen_seg_gt_from_lidarseg.py`: identical
projection to gen_depth_gt but carrying the per-point lidarseg class
(mapped to the 17-class Occ3D taxonomy) instead of depth. The output format
is consumed by `preworld_tpu.data.pipeline.load_seg_map`.

Requires the lidarseg `.bin` label files next to the lidar sweeps
(`{data_root}/lidarseg/...`) and a label-map file (nuScenes general ->
Occ3D 17-class); pass --label-map as a json {src_id: dst_id}.
"""

import argparse
import json
import os
import pickle
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from preworld_tpu.data.pipeline import pose_to_mat

# default nuScenes lidarseg (32 classes) -> Occ3D-nuScenes 17 classes
DEFAULT_LABEL_MAP = {
    0: 0, 1: 0, 5: 0, 7: 0, 8: 0, 10: 0, 11: 0, 13: 0, 19: 0, 20: 0,
    29: 0, 31: 0,
    9: 1, 14: 2, 15: 3, 16: 3, 17: 4, 18: 5, 21: 6, 2: 7, 3: 7, 4: 7,
    6: 7, 12: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15,
    30: 16,
}


def worker(args):
    info, data_root, seg_root, out_dir, label_map = args
    pts = np.fromfile(
        os.path.join(data_root, info["lidar_path"]), dtype=np.float32
    ).reshape(-1, 5)[:, :3]
    token = info.get("lidarseg_path") or None
    if token is None:
        # default layout: lidarseg/<version>/<lidar_token>_lidarseg.bin
        token = info.get("lidar_token")
        if token is None:
            return 0
        seg_path = os.path.join(seg_root, f"{token}_lidarseg.bin")
    else:
        seg_path = os.path.join(data_root, token)
    if not os.path.exists(seg_path):
        return 0
    labels = np.fromfile(seg_path, dtype=np.uint8)
    lut = np.zeros(256, np.uint8)
    for s, d in label_map.items():
        lut[int(s)] = int(d)
    labels = lut[labels]

    lidar2lidarego = pose_to_mat(
        info["lidar2ego_rotation"], info["lidar2ego_translation"]
    )
    lidarego2global = pose_to_mat(
        info["ego2global_rotation"], info["ego2global_translation"]
    )
    n = 0
    for cam, c in info["cams"].items():
        cam2camego = pose_to_mat(
            c["sensor2ego_rotation"], c["sensor2ego_translation"]
        )
        camego2global = pose_to_mat(
            c["ego2global_rotation"], c["ego2global_translation"]
        )
        lidar2cam = np.linalg.inv(camego2global @ cam2camego) @ (
            lidarego2global @ lidar2lidarego
        )
        K = np.asarray(c["cam_intrinsic"], np.float64)
        p_cam = pts @ lidar2cam[:3, :3].T + lidar2cam[:3, 3]
        front = p_cam[:, 2] > 0.1
        uvz = p_cam[front] @ K.T
        uv = uvz[:, :2] / uvz[:, 2:3]
        lab = labels[front]
        keep = (
            (uv[:, 0] >= 0) & (uv[:, 0] < 1600)
            & (uv[:, 1] >= 0) & (uv[:, 1] < 900)
        )
        rec = np.concatenate(
            [uv[keep], lab[keep, None].astype(np.float64)], axis=1
        ).astype(np.float32)
        fname = os.path.split(c["data_path"])[-1]
        rec.tofile(os.path.join(out_dir, f"{fname}.bin"))
        n += rec.shape[0]
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--seg-root", default="data/nuscenes/lidarseg/v1.0-trainval")
    p.add_argument("--out-dir", default="data/seg_gt_lidarseg")
    p.add_argument("--label-map", default=None, help="json {src: dst}")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    label_map = DEFAULT_LABEL_MAP
    if args.label_map:
        with open(args.label_map) as f:
            label_map = {int(k): int(v) for k, v in json.load(f).items()}

    os.makedirs(args.out_dir, exist_ok=True)
    with open(args.ann_file, "rb") as f:
        infos = pickle.load(f)["infos"]
    tasks = [
        (i, args.data_root, args.seg_root, args.out_dir, label_map)
        for i in infos
    ]
    with Pool(args.workers) as pool:
        total = sum(pool.map(worker, tasks))
    print(f"wrote seg GT for {len(infos)} samples ({total} points)")


if __name__ == "__main__":
    main()
