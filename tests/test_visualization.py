"""Smoke test: the headless occupancy renderer CLI produces images from
tools/test.py-style .npz dumps (counterpart of the reference's open3d
tools/visualization, which this environment can't run)."""

import os

import numpy as np

from conftest import run_cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_visual_cli_renders_pngs(tmp_path):
    pred_dir = tmp_path / "preds"
    out_dir = tmp_path / "vis"
    pred_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        sem = np.full((20, 20, 8), 17, np.uint8)  # free
        occ = rng.random((20, 20, 8)) < 0.1
        sem[occ] = rng.integers(0, 17, occ.sum()).astype(np.uint8)
        np.savez_compressed(pred_dir / f"{i:06d}.npz", semantics=sem)
    run_cli(
        os.path.join(REPO, "tools", "visualization", "visual.py"),
        [str(pred_dir), "--out-dir", str(out_dir)],
    )
    pngs = sorted(os.listdir(out_dir))
    assert pngs == ["000000.png", "000001.png"]
    for f in pngs:
        assert (out_dir / f).stat().st_size > 10_000  # a real image


def test_viewpoint_panel_builtin(tmp_path):
    """The per-camera-viewpoint panel (reference visual.py protocol: 6
    masked surround views + flipped backs + top view with ego cube) renders
    from the builtin rig, and the open3d-JSON loader round-trips a
    PinholeCameraParameters file (column-major matrices)."""
    import json
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools", "visualization"))
    import visual

    rng = np.random.default_rng(1)
    sem = np.full((200, 200, 16), 17, np.uint8)
    occ = rng.random((200, 200, 16)) < 0.05
    sem[occ] = rng.integers(0, 17, occ.sum()).astype(np.uint8)
    sem[:, :, 0] = 11  # ground plane

    out = tmp_path / "panel.png"
    panel = visual.render_viewpoint_panel(sem, str(out), viewpoints="builtin")
    assert out.exists() and out.stat().st_size > 10_000
    assert panel.ndim == 3 and panel.shape[2] == 3
    assert panel.std() > 1.0  # actually painted something

    # JSON loader: write an open3d-format file, check column-major decode
    R, t, K, W, H = visual.builtin_viewpoints()["front"]
    ext = np.eye(4)
    ext[:3, :3], ext[:3, 3] = R, t
    d = {
        "class_name": "PinholeCameraParameters",
        "extrinsic": ext.flatten(order="F").tolist(),
        "intrinsic": {
            "height": H, "width": W,
            "intrinsic_matrix": K.flatten(order="F").tolist(),
        },
    }
    p = tmp_path / "cam_front.json"
    p.write_text(json.dumps(d))
    R2, t2, K2, W2, H2 = visual.load_viewpoint_json(str(p))
    np.testing.assert_allclose(R2, R, atol=1e-12)
    np.testing.assert_allclose(t2, t, atol=1e-12)
    np.testing.assert_allclose(K2, K, atol=1e-12)
    assert (W2, H2) == (W, H)
