#!/usr/bin/env python
"""Build bevdetv2-style nuScenes info pkls (offline, once).

Counterpart of the reference `tools/create_data_bevdet.py` +
`tools/data_converter/nuscenes_converter.py`: walks the nuScenes DB, writes
`{out_prefix}-nuscenes_infos_{train,val}.pkl` with per-sample camera
calibration/pose/path records, annotation infos, scene tokens and the
Occ3D `occ_path`.

Requires the `nuscenes-devkit` package (not bundled in this image); the
script degrades to a clear error message when it is missing.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAM_NAMES = [
    "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
    "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT",
]


def build_infos(nusc, scenes, root_path: str, occ_gt_root: str):
    from nuscenes.utils import splits  # noqa: F401

    infos = []
    for sample in nusc.sample:
        scene = nusc.get("scene", sample["scene_token"])
        if scene["name"] not in scenes:
            continue
        lidar_token = sample["data"]["LIDAR_TOP"]
        sd = nusc.get("sample_data", lidar_token)
        cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose = nusc.get("ego_pose", sd["ego_pose_token"])
        info = {
            "token": sample["token"],
            "scene_token": sample["scene_token"],
            "scene_name": scene["name"],
            "frame_idx": sample["token"],  # filled below
            "timestamp": sample["timestamp"],
            "lidar_path": sd["filename"],
            "lidar2ego_rotation": cs["rotation"],
            "lidar2ego_translation": cs["translation"],
            "ego2global_rotation": pose["rotation"],
            "ego2global_translation": pose["translation"],
            "cams": {},
            "occ_path": os.path.join(
                occ_gt_root, scene["name"], sample["token"]
            ),
        }
        for cam in CAM_NAMES:
            cam_token = sample["data"][cam]
            csd = nusc.get("sample_data", cam_token)
            ccs = nusc.get("calibrated_sensor", csd["calibrated_sensor_token"])
            cpose = nusc.get("ego_pose", csd["ego_pose_token"])
            info["cams"][cam] = {
                "data_path": csd["filename"],
                "cam_intrinsic": np.asarray(ccs["camera_intrinsic"]),
                "sensor2ego_rotation": ccs["rotation"],
                "sensor2ego_translation": ccs["translation"],
                "ego2global_rotation": cpose["rotation"],
                "ego2global_translation": cpose["translation"],
            }
        # annotation infos (agent boxes) for BEV aug + planning extensions
        ann_infos = []
        for ann_token in sample["anns"]:
            ann = nusc.get("sample_annotation", ann_token)
            ann_infos.append(ann)
        info["ann_infos"] = ann_infos
        infos.append(info)
    # frame index within scene, timestamp-sorted
    infos.sort(key=lambda e: e["timestamp"])
    counters = {}
    for info in infos:
        c = counters.get(info["scene_token"], 0)
        info["frame_idx"] = c
        counters[info["scene_token"]] = c + 1
    return infos


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root-path", default="data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--occ-gt-root", default="data/nuscenes/gts")
    p.add_argument("--out-prefix", default="bevdetv2")
    args = p.parse_args()

    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils import splits
    except ImportError:
        sys.exit(
            "nuscenes-devkit is required for offline info generation "
            "(pip install nuscenes-devkit on a machine with the dataset)."
        )

    nusc = NuScenes(args.version, args.root_path)
    if args.version == "v1.0-mini":
        split_map = {"train": splits.mini_train, "val": splits.mini_val}
    else:
        split_map = {"train": splits.train, "val": splits.val}
    for split, scenes in split_map.items():
        infos = build_infos(nusc, set(scenes), args.root_path, args.occ_gt_root)
        out = os.path.join(
            args.root_path, f"{args.out_prefix}-nuscenes_infos_{split}.pkl"
        )
        with open(out, "wb") as f:
            pickle.dump(
                {"infos": infos, "metadata": {"version": args.version}}, f
            )
        print(f"wrote {len(infos)} infos -> {out}")


if __name__ == "__main__":
    main()
