"""4-D forecasting dataset adapter (Occ3D-nuScenes temporal + ego traj).

Parity: `mmdet3d/datasets/nuscenes_dataset_occ_trajectory.py:134-524`:
  * index remap requiring >= 12 future frames in-scene, +5 offset for
    OccWorld comparability (`:212-238`)
  * per sample: 6 future occupancy-GT frames, ego future waypoints from the
    OccWorld info pkl, 21-dim AD-MLP ego kinematic state (`:388-476`)
  * temporal evaluation at 0/1/2/3 s via `MetricMIoUTemporal`

Extra files (same formats the reference consumes):
  ego_gt_path:  AD-MLP `data_nuscene.pkl` — dict[token] -> kinematics dict
  traj_gt_path: OccWorld `nuscenes_infos_*_temporal_v3_scene.pkl`
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional, Sequence

import numpy as np

from ..metrics.miou import MetricMIoUTemporal
from .nuscenes import NuScenesOccDataset
from .pipeline import flip_voxels, load_occ_gt

FUTURE_INTERVALS = (1, 2, 3, 4, 5, 6)


def _count_layers(obj) -> int:
    if isinstance(obj, (list, tuple)):
        return 1 + max((_count_layers(x) for x in obj), default=0)
    return 0


def flatten_ego_state(ad_entry: Dict) -> np.ndarray:
    """AD-MLP per-token dict -> flat 21-dim kinematics vector
    (`nuscenes_dataset_occ_trajectory.py:460-475`): keys sorted, 'gt'
    skipped, nested lists flattened."""
    out = []
    for k in sorted(ad_entry):
        if k == "gt":
            continue
        ele = ad_entry[k]
        if _count_layers(ele) == 2:
            out += list(ele)
        else:
            out.append(ele)
    return np.concatenate(
        [np.ravel(np.asarray(e, np.float32)) for e in out]
    ).astype(np.float32)


class NuScenesOccTrajDataset(NuScenesOccDataset):
    def __init__(
        self,
        *args,
        ego_gt_path: Optional[str] = None,
        traj_gt_path: Optional[str] = None,
        min_future_frames: int = 12,
        occworld_offset: int = 5,
        num_future: int = 6,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self._keep_flip_meta = True
        self.num_future = num_future
        self.ad_info = (
            pickle.load(open(ego_gt_path, "rb")) if ego_gt_path else {}
        )
        if traj_gt_path:
            self.traj_info = pickle.load(open(traj_gt_path, "rb"))["infos"]
        else:
            self.traj_info = {}
        # index remap (`:227-238`): keep keyframes with >= min_future_frames
        # future frames in the same scene, then shift +occworld_offset.
        self.temp2nusc_map = []
        for idx, info in enumerate(self.infos):
            tail = idx + min_future_frames
            if (
                tail < len(self.infos)
                and self.infos[tail]["scene_token"] == info["scene_token"]
            ):
                self.temp2nusc_map.append(idx + occworld_offset)

    def __len__(self):
        return len(self.temp2nusc_map)

    def _future_info(self, index: int, t: int) -> Dict:
        """Info record t frames ahead, guaranteed same-scene.

        The remap in __init__ admits only keyframes with >= min_future_frames
        (12) same-scene successors, and occworld_offset (5) + max horizon (6)
        stays within that window — so index+t can never cross a scene
        boundary today. The assert makes GT-from-the-wrong-scene impossible
        if those constants ever drift (the reference guards this structurally,
        `nuscenes_dataset_occ_trajectory.py:212-238`).
        """
        return self.infos[self._future_index(index, t)]

    def _future_index(self, index: int, t: int) -> int:
        fidx = min(index + t, len(self.infos) - 1)
        assert (
            self.infos[fidx]["scene_token"]
            == self.infos[index]["scene_token"]
        ), (
            f"future frame +{t} of sample {index} crosses a scene boundary "
            "(remap invariant violated — check min_future_frames vs "
            "occworld_offset + horizon)"
        )
        return fidx

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        index = self.temp2nusc_map[idx]
        sample = super().__getitem__(index)
        info = self.infos[index]

        # future occupancy GT (+ the same bda flips as the key frame)
        sx_sem = []
        for t in FUTURE_INTERVALS[: self.num_future]:
            finfo = self._future_info(index, t)
            occ = load_occ_gt(self._data_path(finfo["occ_path"]))
            sx_sem.append(occ["voxel_semantics"])
        temporal_sem = np.stack(sx_sem)
        if "__bda_flips" in sample:
            fdx, fdy = sample["__bda_flips"]
            temporal_sem = np.stack(
                [
                    flip_voxels({"s": s}, fdx, fdy)["s"]
                    for s in temporal_sem
                ]
            )
        sample["temporal_semantics"] = temporal_sem.astype(np.int32)

        # ego future waypoints (OccWorld pkl, `:403-405`)
        scene = info.get("scene_name")
        frame = info.get("frame_idx")
        if scene in self.traj_info and frame in self.traj_info[scene]:
            trajs = np.asarray(
                self.traj_info[scene][frame]["gt_ego_fut_trajs"], np.float32
            )
        else:
            trajs = np.zeros((self.num_future, 2), np.float32)
        sample["temporal_trajs"] = trajs[: self.num_future]

        # current ego kinematic state (AD-MLP pkl)
        token = info.get("token")
        if token in self.ad_info:
            sample["ego_states"] = flatten_ego_state(self.ad_info[token])
        else:
            sample["ego_states"] = np.zeros(21, np.float32)

        # future rays for rendering-supervised forecasting
        if self.use_rays:
            rng = np.random.default_rng(self._seed + idx)
            temporal_rays = [
                self._rays(self._future_index(index, t), rng)
                for t in FUTURE_INTERVALS[: self.num_future]
            ]
            sample["temporal_rays"] = np.stack(temporal_rays)
        sample.pop("__bda_flips", None)
        return sample

    # ------------------------------------------------------------------
    def evaluate_temporal(
        self, preds_by_horizon: Sequence[Dict[int, np.ndarray]]
    ) -> Dict:
        """4-D protocol: unmasked mIoU at 0/1/2/3 s, horizons keyed by frame
        offsets {0, 2, 4, 6} (`nuscenes_dataset_occ_trajectory.py:478-524`)."""
        metric = MetricMIoUTemporal(num_classes=18)
        for i, preds in enumerate(preds_by_horizon):
            index = self.temp2nusc_map[i]
            gts = {}
            for h, frames in zip((0, 1, 2, 3), (0, 2, 4, 6)):
                finfo = self._future_info(index, frames)
                gts[h] = load_occ_gt(self._data_path(finfo["occ_path"]))[
                    "voxel_semantics"
                ]
            metric.add_batch(preds, gts)
        return metric.count_miou()
