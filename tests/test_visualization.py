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
