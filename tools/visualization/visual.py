#!/usr/bin/env python
"""Render predicted occupancy grids to images (matplotlib, headless).

Counterpart of the reference `tools/visualization/visual.py` (open3d voxel
renders): this environment is headless and open3d-free, so we render a BEV
class map + a z-colored 3D scatter per sample with the Occ3D palette.

Input: .npz prediction dumps from tools/test.py --out (key `semantics`,
(X, Y, Z) uint8/int) or raw occupancy `labels.npz` files.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

# Occ3D palette (`mmdet3d/models/detectors/bevdet_occ.py:15-35`)
COLORS = np.array(
    [
        [0, 0, 0], [255, 158, 0], [0, 0, 230], [200, 0, 0], [220, 20, 60],
        [200, 200, 200], [255, 140, 0], [233, 150, 70], [255, 61, 99],
        [112, 128, 144], [222, 184, 135], [100, 100, 100], [165, 42, 42],
        [50, 50, 50], [75, 0, 75], [255, 0, 0], [0, 175, 0], [255, 255, 255],
    ],
    np.uint8,
)


def render(sem: np.ndarray, out_path: str, free_idx: int = 17):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(16, 8))

    # BEV: topmost non-free class per (x, y) column
    occ = sem != free_idx
    top_z = np.where(occ.any(-1), occ.shape[-1] - 1 - np.argmax(occ[..., ::-1], -1), -1)
    bev = np.full(sem.shape[:2], free_idx, sem.dtype)
    has = top_z >= 0
    xs, ys = np.nonzero(has)
    bev[xs, ys] = sem[xs, ys, top_z[xs, ys]]
    axes[0].imshow(COLORS[np.clip(bev.T, 0, 17)], origin="lower")
    axes[0].set_title("BEV semantic occupancy")
    axes[0].set_xlabel("x")
    axes[0].set_ylabel("y")

    # sparse 3D scatter
    idx = np.argwhere(occ)
    if idx.shape[0] > 0:
        sub = idx[:: max(1, idx.shape[0] // 60000)]
        ax3 = fig.add_subplot(1, 2, 2, projection="3d")
        axes[1].axis("off")
        c = COLORS[np.clip(sem[sub[:, 0], sub[:, 1], sub[:, 2]], 0, 17)] / 255.0
        ax3.scatter(sub[:, 0], sub[:, 1], sub[:, 2], c=c, s=1, marker="s")
        ax3.set_box_aspect((sem.shape[0], sem.shape[1], sem.shape[2] * 4))
        ax3.set_title("3D occupancy")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pred_dir", help="dir of .npz dumps (tools/test.py --out)")
    p.add_argument("--out-dir", default="vis")
    p.add_argument("--max-samples", type=int, default=20)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(args.pred_dir) if f.endswith(".npz")
    )[: args.max_samples]
    for f in files:
        data = np.load(os.path.join(args.pred_dir, f))
        sem = data["semantics"] if "semantics" in data else data[data.files[0]]
        out = os.path.join(args.out_dir, f.replace(".npz", ".png"))
        render(np.asarray(sem), out)
        print("wrote", out)


if __name__ == "__main__":
    main()
