#!/usr/bin/env python
"""Project lidar points into each camera -> per-image sparse depth `.bin`.

Counterpart of `tools/gen_data/gen_depth_gt.py` (reference): for every sample
and camera, transform the lidar sweep into the camera frame, keep points in
front of the camera that land inside the image, and write
(u, v, depth) float32 triplets to `{out_dir}/{img_filename}.bin` — the exact
format `preworld_tpu.data.pipeline.load_sparse_depth` consumes.

Runs from the info pkl (no nuscenes-devkit needed) with a process pool.
"""

import argparse
import os
import pickle
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from preworld_tpu.data.pipeline import pose_to_mat


def worker(args):
    info, data_root, out_dir = args
    pts = np.fromfile(
        os.path.join(data_root, info["lidar_path"]), dtype=np.float32
    ).reshape(-1, 5)[:, :3]
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
        p_cam = p_cam[front]
        uvz = p_cam @ K.T
        uv = uvz[:, :2] / uvz[:, 2:3]
        keep = (
            (uv[:, 0] >= 0) & (uv[:, 0] < 1600)
            & (uv[:, 1] >= 0) & (uv[:, 1] < 900)
        )
        rec = np.concatenate(
            [uv[keep], p_cam[keep, 2:3]], axis=1
        ).astype(np.float32)
        fname = os.path.split(c["data_path"])[-1]
        rec.tofile(os.path.join(out_dir, f"{fname}.bin"))
        n += rec.shape[0]
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--out-dir", default="data/depth_gt")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    with open(args.ann_file, "rb") as f:
        infos = pickle.load(f)["infos"]
    tasks = [(i, args.data_root, args.out_dir) for i in infos]
    with Pool(args.workers) as pool:
        total = sum(pool.map(worker, tasks))
    print(f"wrote depth GT for {len(infos)} samples ({total} points)")


if __name__ == "__main__":
    main()
