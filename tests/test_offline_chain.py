"""Offline data-prep chain e2e (VERDICT r2 next #5).

Generates a raw nuScenes-LAYOUT fixture (JSON tables + JPEGs + lidar
sweeps + lidarseg labels + Occ3D labels.npz), then runs the REAL CLI chain
tools/create_data.py -> gen_depth_gt.py -> gen_seg_gt.py ->
precompute_rays.py, feeds the produced files to NuScenesOccDataset (both
the on-the-fly and the ray-cache path), and takes one pretrain train step —
proving the converters produce exactly what the dataset consumes.

Reference chain: `tools/create_data_bevdet.py:42-110`,
`tools/gen_data/gen_depth_gt.py:12-76`,
`tools/gen_data/gen_seg_gt_from_lidarseg.py`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_SAMPLES = 4
CAMS = (
    "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
    "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT",
)


def rotmat_to_quat(R):
    """3x3 rotation -> [w, x, y, z]."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w < 1e-8:
        # fixture rigs never hit 180-degree rotations
        raise ValueError("degenerate quaternion")
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return [float(w), float(x), float(y), float(z)]


def build_fixture(root):
    """Raw nuScenes layout: 1 scene, N_SAMPLES key frames, 6 cams."""
    from preworld_tpu.data.synthetic import camera_rig

    rng = np.random.default_rng(0)
    version = "v1.0-mini"
    os.makedirs(os.path.join(root, version))
    rig = camera_rig(len(CAMS), (900, 1600), rng)

    scenes = [{"token": "sc1", "name": "scene-0001"}]
    samples, sample_datas, calibs, poses, sensors, anns = [], [], [], [], [], []

    sensors.append({"token": "sens_lidar", "channel": "LIDAR_TOP"})
    calibs.append({
        "token": "cs_lidar", "sensor_token": "sens_lidar",
        "rotation": [1.0, 0.0, 0.0, 0.0], "translation": [0.0, 0.0, 1.8],
        "camera_intrinsic": [],
    })
    for n, cam in enumerate(CAMS):
        sensors.append({"token": f"sens_{cam}", "channel": cam})
        calibs.append({
            "token": f"cs_{cam}", "sensor_token": f"sens_{cam}",
            "rotation": rotmat_to_quat(rig["sensor2ego"][n][:3, :3]),
            "translation": [float(v) for v in rig["sensor2ego"][n][:3, 3]],
            "camera_intrinsic": rig["intrin"][n].tolist(),
        })

    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"))
    os.makedirs(os.path.join(root, "lidarseg", version))
    for cam in CAMS:
        os.makedirs(os.path.join(root, "samples", cam))

    # one shared gradient image (content is irrelevant; geometry is not)
    img = np.zeros((900, 1600, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, 1600, dtype=np.uint8)[None, :]
    img[..., 1] = np.linspace(0, 255, 900, dtype=np.uint8)[:, None]

    for i in range(N_SAMPLES):
        tok = f"smp{i}"
        samples.append({
            "token": tok, "scene_token": "sc1",
            "timestamp": 1_000_000 * (i + 1),
        })
        pose = {
            "token": f"pose{i}", "rotation": [1.0, 0.0, 0.0, 0.0],
            "translation": [2.0 * i, 0.0, 0.0],
        }
        poses.append(pose)

        lidar_tok = f"sd_lidar{i}"
        lidar_file = f"samples/LIDAR_TOP/l{i}.pcd.bin"
        sample_datas.append({
            "token": lidar_tok, "sample_token": tok,
            "calibrated_sensor_token": "cs_lidar",
            "ego_pose_token": f"pose{i}", "filename": lidar_file,
            "is_key_frame": True,
        })
        pts = np.zeros((3000, 5), np.float32)
        pts[:, 0] = rng.uniform(-35, 35, 3000)   # x
        pts[:, 1] = rng.uniform(-35, 35, 3000)   # y
        pts[:, 2] = rng.uniform(-1.5, 3.0, 3000) # z (lidar frame)
        pts.tofile(os.path.join(root, lidar_file))
        rng.integers(0, 32, 3000, dtype=np.uint8).tofile(
            os.path.join(root, "lidarseg", version,
                         f"{lidar_tok}_lidarseg.bin")
        )

        for cam in CAMS:
            fname = f"samples/{cam}/c{i}_{cam}.jpg"
            Image.fromarray(img).save(os.path.join(root, fname), quality=70)
            sample_datas.append({
                "token": f"sd_{cam}{i}", "sample_token": tok,
                "calibrated_sensor_token": f"cs_{cam}",
                "ego_pose_token": f"pose{i}", "filename": fname,
                "is_key_frame": True,
            })

        # Occ3D GT at the tiny 20x20x8 grid the test model uses
        gt_dir = os.path.join(root, "gts", "scene-0001", tok)
        os.makedirs(gt_dir)
        np.savez_compressed(
            os.path.join(gt_dir, "labels.npz"),
            semantics=rng.integers(0, 18, (20, 20, 8)).astype(np.uint8),
            mask_lidar=rng.uniform(size=(20, 20, 8)) > 0.3,
            mask_camera=rng.uniform(size=(20, 20, 8)) > 0.3,
        )

    tables = {
        "scene": scenes, "sample": samples, "sample_data": sample_datas,
        "calibrated_sensor": calibs, "ego_pose": poses, "sensor": sensors,
        "sample_annotation": anns,
    }
    for name, rows in tables.items():
        with open(os.path.join(root, version, f"{name}.json"), "w") as f:
            json.dump(rows, f)


from conftest import run_cli as _run_cli  # noqa: E402


@pytest.mark.slow
def test_converters_to_train_step(tmp_path):
    root = str(tmp_path / "nusc")
    os.makedirs(root)
    build_fixture(root)

    # 1) info pkls (devkit-free JSON join)
    _run_cli(os.path.join(REPO, "tools", "create_data.py"),
             ["--root-path", root, "--version", "v1.0-mini",
              "--occ-gt-root", "gts", "--out-prefix", "fixture",
              "--train-scenes", "scene-0001", "--val-scenes", "scene-0001"])
    ann = os.path.join(root, "fixture-nuscenes_infos_train.pkl")
    import pickle
    with open(ann, "rb") as f:
        infos = pickle.load(f)["infos"]
    assert len(infos) == N_SAMPLES
    assert set(infos[0]["cams"]) == set(CAMS)
    assert "lidar_token" in infos[0]

    # 2) sparse depth GT
    depth_dir = str(tmp_path / "depth_gt")
    _run_cli(os.path.join(REPO, "tools", "gen_depth_gt.py"),
             ["--ann-file", ann, "--data-root", root,
              "--out-dir", depth_dir, "--workers", "2"])
    bins = os.listdir(depth_dir)
    assert len(bins) == N_SAMPLES * len(CAMS)
    assert any(os.path.getsize(os.path.join(depth_dir, b)) > 0 for b in bins)

    # 3) lidarseg seg GT
    seg_dir = str(tmp_path / "seg_gt")
    _run_cli(os.path.join(REPO, "tools", "gen_seg_gt.py"),
             ["--ann-file", ann, "--data-root", root,
              "--seg-root", os.path.join(root, "lidarseg", "v1.0-mini"),
              "--out-dir", seg_dir, "--workers", "2"])
    assert any(
        os.path.getsize(os.path.join(seg_dir, b)) > 0
        for b in os.listdir(seg_dir)
    )

    # 4) offline ray cache
    rays_dir = str(tmp_path / "rays_cache")
    _run_cli(os.path.join(REPO, "tools", "precompute_rays.py"),
             [ann, "--depth-gt-path", depth_dir,
              "--semantic-gt-path", seg_dir, "--out-dir", rays_dir,
              "--data-root", root, "--workers", "4"])
    assert len(os.listdir(rays_dir)) == N_SAMPLES * len(CAMS)

    # 5) the dataset consumes all of it
    from preworld_tpu.data import tiny_config
    from preworld_tpu.data.nuscenes import NuScenesOccDataset

    data_config = dict(
        cams=list(CAMS), input_size=(64, 128), resize=(-0.06, 0.11),
        crop_h=(0.0, 0.0), flip=True, rot=(-5.4, 5.4), resize_test=0.0,
        Ncams=6,
    )
    grid_config = dict(
        x=[-8.0, 8.0, 0.8], y=[-8.0, 8.0, 0.8], z=[-1.0, 5.4, 0.8],
        depth=[1.0, 9.0, 0.5],
    )
    common = dict(
        ann_file=ann, data_config=data_config, grid_config=grid_config,
        is_train=True, use_rays=True, max_ray_nums=256,
        depth_gt_path=depth_dir, semantic_gt_path=seg_dir, data_root=root,
    )
    ds = NuScenesOccDataset(**common)
    s = ds[1]
    assert s["imgs"].shape == (3, 6, 64, 128, 3)
    assert s["voxel_semantics"].shape == (20, 20, 8)
    assert s["rays"].shape[0] == 256
    assert np.isfinite(s["rays"]).all()
    assert (s["gt_depth"] > 0).any(), "no lidar point projected into any cam"

    # the ray-cache fast path yields the same record structure
    ds_cached = NuScenesOccDataset(ray_cache_path=rays_dir, **common)
    s2 = ds_cached[1]
    assert s2["rays"].shape == s["rays"].shape
    assert np.isfinite(s2["rays"]).all()

    # 6) one pretrain train step from the produced sample
    from preworld_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )
    from preworld_tpu.models import PreWorld

    cfg = tiny_config(
        input_size=(64, 128), num_cams=6,
        if_pretrain=True, if_render=True, use_lss_depth_loss=True,
    )
    model = PreWorld(cfg)
    batch = {
        k: jnp.asarray(v[None]) for k, v in s.items()
        if not k.startswith("__") and k not in ("mask_lidar",)
    }
    tx = make_optimizer()
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"])), metrics
