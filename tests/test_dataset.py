"""End-to-end data-layer tests against a generated on-disk nuScenes fixture.

Builds a miniature dataset in the reference's exact formats (bevdetv2 info
pkl, camera JPEGs, lidar .bin sweeps, occupancy labels.npz, sparse depth/seg
GT bins) and drives NuScenesOccDataset / the traj variant / the DataLoader
through it into a model-consumable batch.
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from preworld_tpu.data.loader import DataLoader, collate
from preworld_tpu.data.nuscenes import NuScenesOccDataset
from preworld_tpu.data.nuscenes_traj import NuScenesOccTrajDataset

W_SRC, H_SRC = 64, 48  # "source camera" resolution
CAMS = ["CAM_A", "CAM_B"]
DATA_CONFIG = dict(
    cams=CAMS, Ncams=2, input_size=(32, 64), src_size=(H_SRC, W_SRC),
    resize=(-0.06, 0.11), rot=(-5.4, 5.4), flip=True, crop_h=(0.0, 0.0),
    resize_test=0.0,
)
GRID_CONFIG = dict(
    x=[-8.0, 8.0, 1.0], y=[-8.0, 8.0, 1.0], z=[-1.0, 3.0, 1.0],
    depth=[1.0, 9.0, 0.5],
)


def quat_identity():
    return [1.0, 0.0, 0.0, 0.0]


@pytest.fixture(scope="module")
def fake_nuscenes(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_nusc")
    (root / "imgs").mkdir()
    (root / "lidar").mkdir()
    (root / "depth_gt").mkdir()
    (root / "seg_gt").mkdir()
    rng = np.random.default_rng(0)

    n_frames = 20
    infos = []
    for t in range(n_frames):
        scene = "scene-0001" if t < 15 else "scene-0002"
        occ_dir = root / "occ" / scene / f"tok{t:03d}"
        occ_dir.mkdir(parents=True)
        sem = rng.integers(0, 18, (16, 16, 4)).astype(np.uint8)
        np.savez_compressed(
            occ_dir / "labels.npz",
            semantics=sem,
            mask_lidar=rng.uniform(size=sem.shape) > 0.5,
            mask_camera=rng.uniform(size=sem.shape) > 0.3,
        )
        lidar_path = root / "lidar" / f"sweep{t:03d}.bin"
        pts = rng.uniform(-8, 8, (500, 5)).astype(np.float32)
        pts[:, 2] = rng.uniform(0, 2, 500)
        pts.tofile(lidar_path)

        info = {
            "token": f"tok{t:03d}",
            "scene_token": scene,
            "scene_name": scene,
            "frame_idx": t if t < 15 else t - 15,
            "timestamp": 1000 + t,
            "lidar_path": str(lidar_path),
            "lidar2ego_rotation": quat_identity(),
            "lidar2ego_translation": [0.0, 0.0, 1.0],
            "ego2global_rotation": quat_identity(),
            "ego2global_translation": [0.4 * t, 0.0, 0.0],
            "occ_path": str(occ_dir),
            "cams": {},
        }
        for ci, cam in enumerate(CAMS):
            img_path = root / "imgs" / f"t{t}_{cam}.jpg"
            Image.fromarray(
                rng.integers(0, 255, (H_SRC, W_SRC, 3), dtype=np.uint8)
            ).save(img_path)
            info["cams"][cam] = {
                "data_path": str(img_path),
                "cam_intrinsic": np.array(
                    [[40.0, 0, W_SRC / 2], [0, 40.0, H_SRC / 2], [0, 0, 1]]
                ),
                "sensor2ego_rotation": quat_identity(),
                "sensor2ego_translation": [0.0, 0.5 * ci, 1.5],
                "ego2global_rotation": quat_identity(),
                "ego2global_translation": [0.4 * t, 0.0, 0.0],
            }
            # sparse depth/seg GT (u, v, value) triplets
            n = 40
            uv = np.stack(
                [rng.integers(0, W_SRC, n), rng.integers(0, H_SRC, n)], axis=1
            ).astype(np.float32)
            depth = rng.uniform(1.5, 8.0, n).astype(np.float32)
            seg = rng.integers(0, 17, n).astype(np.float32)
            np.concatenate([uv, depth[:, None]], 1).astype(np.float32).tofile(
                root / "depth_gt" / (img_path.name + ".bin")
            )
            np.concatenate([uv, seg[:, None]], 1).astype(np.float32).tofile(
                root / "seg_gt" / (img_path.name + ".bin")
            )
        infos.append(info)
    ann = root / "infos.pkl"
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "fake"}}, f)
    return root, str(ann)


class TestNuScenesDataset:
    def _make(self, fake_nuscenes, **kw):
        root, ann = fake_nuscenes
        return NuScenesOccDataset(
            ann_file=ann,
            data_config=DATA_CONFIG,
            grid_config=GRID_CONFIG,
            is_train=True,
            depth_gt_path=str(root / "depth_gt"),
            semantic_gt_path=str(root / "seg_gt"),
            **kw,
        )

    def test_sample_shapes(self, fake_nuscenes):
        ds = self._make(fake_nuscenes)
        s = ds[5]
        H, W = DATA_CONFIG["input_size"]
        assert s["imgs"].shape == (3, 2, H, W, 3)  # T=3 (key + adj + stereo)
        assert s["sensor2egos"].shape == (3, 2, 4, 4)
        assert s["voxel_semantics"].shape == (16, 16, 4)
        assert s["gt_depth"].shape == (2, H, W)
        assert s["bda"].shape == (3, 3)
        # images normalized: roughly zero-mean after mmlab norm
        assert abs(float(s["imgs"].mean())) < 1.0

    def test_adjacent_frames_use_previous_poses(self, fake_nuscenes):
        ds = self._make(fake_nuscenes)
        s = ds[5]
        # ego x positions: key=5 -> 2.0, adj=4 -> 1.6, stereo ref=3 -> 1.2
        xs = s["ego2globals"][:, 0, 0, 3]
        np.testing.assert_allclose(xs, [2.0, 1.6, 1.2], atol=1e-5)

    def test_scene_boundary_repeats_current(self, fake_nuscenes):
        ds = self._make(fake_nuscenes)
        s = ds[15]  # first frame of scene-0002
        xs = s["ego2globals"][:, 0, 0, 3]
        np.testing.assert_allclose(xs, [0.4 * 15] * 3, atol=1e-5)

    def test_rays_generated(self, fake_nuscenes):
        ds = self._make(fake_nuscenes, use_rays=True, aux_frames=[-1, 1],
                        max_ray_nums=64)
        s = ds[5]
        assert s["rays"].shape == (64, 16)
        # depth labels in range, origins near the ego
        assert float(s["rays"][:, 2].min()) >= 0
        assert np.isfinite(s["rays"]).all()

    def test_loader_collates_batches(self, fake_nuscenes):
        ds = self._make(fake_nuscenes)
        loader = DataLoader(ds, batch_size=2, num_workers=2, seed=0)
        batch = next(iter(loader))
        assert batch["imgs"].shape[0] == 2
        assert batch["voxel_semantics"].shape == (2, 16, 16, 4)

    def test_eval_protocol(self, fake_nuscenes):
        ds = self._make(fake_nuscenes)
        # perfect predictions -> 100 mIoU
        preds = []
        for i in range(3):
            from preworld_tpu.data.pipeline import load_occ_gt

            preds.append(
                load_occ_gt(ds._data_path(ds.infos[i]["occ_path"]))[
                    "voxel_semantics"
                ]
            )
        res = ds.evaluate(preds)
        assert res["mIoU"] == 100.0


class TestTrajDataset:
    def test_traj_sample(self, fake_nuscenes):
        root, ann = fake_nuscenes
        ds = NuScenesOccTrajDataset(
            ann_file=ann,
            data_config=DATA_CONFIG,
            grid_config=GRID_CONFIG,
            is_train=True,
            min_future_frames=6,
            occworld_offset=2,
            num_future=3,
        )
        assert len(ds) > 0
        s = ds[0]
        assert s["temporal_semantics"].shape == (3, 16, 16, 4)
        assert s["temporal_trajs"].shape == (3, 2)
        assert s["ego_states"].shape == (21,)
        assert "__bda_flips" not in s

    def test_model_consumes_dataset_batch(self, fake_nuscenes):
        """Full path: disk -> pipeline -> collate -> PreWorld loss."""
        import jax
        import jax.numpy as jnp

        from preworld_tpu.data import tiny_config
        from preworld_tpu.geometry.frustum import GridConfig
        from preworld_tpu.models import PreWorld
        from preworld_tpu.train import create_train_state, make_optimizer

        root, ann = fake_nuscenes
        ds = NuScenesOccDataset(
            ann_file=ann, data_config=DATA_CONFIG, grid_config=GRID_CONFIG,
            is_train=True, use_rays=True, aux_frames=[-1, 1],
            max_ray_nums=64,
            depth_gt_path=str(root / "depth_gt"),
            semantic_gt_path=str(root / "seg_gt"),
        )
        batch_np = collate([ds[4], ds[5]])
        cfg = tiny_config(
            input_size=DATA_CONFIG["input_size"], num_cams=2,
            grid=GridConfig(
                x=tuple(GRID_CONFIG["x"]), y=tuple(GRID_CONFIG["y"]),
                z=tuple(GRID_CONFIG["z"]), depth=tuple(GRID_CONFIG["depth"]),
            ),
            if_pretrain=True, if_render=True, use_lss_depth_loss=True,
        )
        model = PreWorld(cfg)
        batch = {
            k: jnp.asarray(v) for k, v in batch_np.items()
            if not k.startswith("__")
        }
        state = create_train_state(model, batch, make_optimizer(),
                                   jax.random.PRNGKey(0))
        losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
        )
        for k, v in losses.items():
            assert np.isfinite(float(v)), k


class TestRayCache:
    def test_precompute_matches_direct_path(self, fake_nuscenes, tmp_path):
        """tools/precompute_rays.py cache + the dataset's ray_cache_path fast
        path reproduce the direct 84-file per-sample ray build (same WRS
        draw -> same rays within float tolerance)."""
        import subprocess
        import sys as _sys

        root, ann = fake_nuscenes
        cache = tmp_path / "ray_cache"
        tool = os.path.join(
            os.path.dirname(__file__), "..", "tools", "precompute_rays.py"
        )
        subprocess.run(
            [_sys.executable, tool, ann,
             "--depth-gt-path", str(root / "depth_gt"),
             "--semantic-gt-path", str(root / "seg_gt"),
             "--out-dir", str(cache)],
            check=True,
        )
        assert len(list(cache.glob("*.npz"))) == 40  # 20 frames x 2 cams

        kw = dict(
            ann_file=ann, data_config=DATA_CONFIG, grid_config=GRID_CONFIG,
            is_train=True, use_rays=True, aux_frames=[-1, 1],
            max_ray_nums=96,
            depth_gt_path=str(root / "depth_gt"),
            semantic_gt_path=str(root / "seg_gt"),
        )
        direct = NuScenesOccDataset(**kw)
        cached = NuScenesOccDataset(ray_cache_path=str(cache), **kw)
        rng_a = np.random.default_rng(11)
        rng_b = np.random.default_rng(11)
        r_direct = direct._rays(5, rng_a)
        r_cached = cached._rays(5, rng_b)
        assert r_direct.shape == r_cached.shape == (96, 16)
        np.testing.assert_allclose(r_cached, r_direct, rtol=1e-4, atol=1e-4)


class TestTrajTrainPath:
    def test_traj_model_consumes_dataset_batch(self, fake_nuscenes):
        """Full 4D-traj training path: disk -> traj pipeline -> collate ->
        PreWorld4DTraj rollout loss (the tools/train.py wiring for
        model.type == 'PreWorld4DTraj'; reference
        `nuscenes_dataset_occ_trajectory.py:388-476` -> `forward_train`)."""
        import jax
        import jax.numpy as jnp

        from preworld_tpu.data import tiny_config
        from preworld_tpu.geometry.frustum import GridConfig
        from preworld_tpu.models import PreWorld4DTraj
        from preworld_tpu.train import create_train_state, make_optimizer

        root, ann = fake_nuscenes
        ds = NuScenesOccTrajDataset(
            ann_file=ann, data_config=DATA_CONFIG, grid_config=GRID_CONFIG,
            is_train=True, use_rays=True, aux_frames=[-1, 1],
            max_ray_nums=64, min_future_frames=6, occworld_offset=2,
            num_future=2,
            depth_gt_path=str(root / "depth_gt"),
            semantic_gt_path=str(root / "seg_gt"),
        )
        batch_np = collate([ds[0], ds[1]])
        cfg = tiny_config(
            input_size=DATA_CONFIG["input_size"], num_cams=2,
            grid=GridConfig(
                x=tuple(GRID_CONFIG["x"]), y=tuple(GRID_CONFIG["y"]),
                z=tuple(GRID_CONFIG["z"]), depth=tuple(GRID_CONFIG["depth"]),
            ),
            if_pretrain=True, if_render=True, use_lss_depth_loss=True,
        )
        model = PreWorld4DTraj(cfg)
        batch = {
            k: jnp.asarray(v) for k, v in batch_np.items()
            if not k.startswith("__")
        }
        state = create_train_state(model, batch, make_optimizer(),
                                   jax.random.PRNGKey(0))
        losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, num_future=2,
        )
        # per-horizon render + traj losses present and finite
        assert "loss_traj_1s" in losses and "loss_traj_2s" in losses
        assert any(k.endswith("_2s") and "render" in k for k in losses)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k


class TestTrajExtraPkls:
    """AD-MLP ego-state + OccWorld trajectory pkl consumption."""

    def test_flatten_ego_state_format(self):
        from preworld_tpu.data.nuscenes_traj import flatten_ego_state

        # AD-MLP per-token dict: sorted keys, 'gt' skipped, nested lists
        # flattened (`nuscenes_dataset_occ_trajectory.py:460-475`)
        entry = {
            "b_accel": [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]],  # depth-2 -> extend
            "a_vel": [1.0, 2.0, 3.0],  # depth-1 -> append as element blocks
            "gt": [9.9, 9.9],  # skipped
            "c_cmd": 1.0,
        }
        out = flatten_ego_state(entry)
        # keys sorted: a_vel, b_accel, c_cmd
        np.testing.assert_allclose(
            out, [1.0, 2.0, 3.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 1.0]
        )

    def test_traj_dataset_with_pkls(self, fake_nuscenes, tmp_path):
        root, ann = fake_nuscenes
        # build AD-MLP + OccWorld pkls covering the fixture's tokens
        with open(ann, "rb") as f:
            infos = pickle.load(f)["infos"]
        ad_info = {
            i["token"]: {"vel": list(np.arange(21, dtype=float))}
            for i in infos
        }
        traj_info = {"infos": {}}
        for i in infos:
            traj_info["infos"].setdefault(i["scene_name"], {})[
                i["frame_idx"]
            ] = {"gt_ego_fut_trajs": np.ones((6, 2), np.float32) * 0.5}
        ego_p = tmp_path / "ad.pkl"
        traj_p = tmp_path / "occworld.pkl"
        with open(ego_p, "wb") as f:
            pickle.dump(ad_info, f)
        with open(traj_p, "wb") as f:
            pickle.dump(traj_info, f)

        ds = NuScenesOccTrajDataset(
            ann_file=ann,
            data_config=DATA_CONFIG,
            grid_config=GRID_CONFIG,
            is_train=True,
            min_future_frames=6,
            occworld_offset=2,
            num_future=3,
            ego_gt_path=str(ego_p),
            traj_gt_path=str(traj_p),
        )
        s = ds[0]
        np.testing.assert_allclose(s["ego_states"], np.arange(21, dtype=float))
        np.testing.assert_allclose(s["temporal_trajs"], 0.5)


class TestLoaderRobustness:
    class _BoomDataset:
        """10 good samples, sample 5 raises (corrupt-file stand-in)."""

        def __len__(self):
            return 10

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt sample 5")
            return {"x": np.full((3,), float(i), np.float32)}

    def test_dataset_error_propagates_not_hangs(self):
        loader = DataLoader(
            self._BoomDataset(), batch_size=2, shuffle=False,
            num_workers=2, drop_last=True,
        )
        with pytest.raises(ValueError, match="corrupt sample 5"):
            for _ in loader:
                pass

    def test_abandoned_iterator_unblocks_producer(self):
        import threading

        class _Slow:
            def __len__(self):
                return 64

            def __getitem__(self, i):
                return {"x": np.zeros((1,), np.float32)}

        before = threading.active_count()
        for _ in range(8):
            it = iter(DataLoader(_Slow(), batch_size=2, num_workers=1,
                                 prefetch=1))
            next(it)
            it.close()  # abandon mid-epoch with a full prefetch queue
        # producer threads must observe stop and exit (generous deadline)
        import time

        deadline = time.time() + 10.0
        while time.time() < deadline:
            if threading.active_count() <= before + 1:
                break
            time.sleep(0.1)
        assert threading.active_count() <= before + 1, (
            threading.active_count(), before
        )
