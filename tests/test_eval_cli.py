"""Eval-CLI smoke tests across model types (regression: tools/test.py used
to pass align_after_vt to every model's predict; BEVStereo4DOCC takes no
such kwarg and eval crashed at trace — reference --no-aavt only affects
the PreWorld/BEVDet4D path, `tools/test.py:82,211`)."""

import os
import sys

import pytest

from conftest import run_cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BEVSTEREO_TINY_CFG = """
grid_config = dict(
    x=[-8.0, 8.0, 0.8], y=[-8.0, 8.0, 0.8], z=[-1.0, 5.4, 0.8],
    depth=[1.0, 9.0, 0.5],
)
data_config = dict(input_size=(64, 128), Ncams=1)
model = dict(
    type="BEVStereo4DOCC",
    backbone="swin",
    swin=dict(embed_dims=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
              window_size=4),
    neck_out_channels=24,
    num_trans_channels=8,
    out_dim=8,
    use_lss_depth_loss=True,
)
data = dict(samples_per_gpu=1, workers_per_gpu=0,
            train=dict(max_ray_nums=64))
log_interval = 1
runner = dict(max_epochs=1)
"""


@pytest.mark.slow
def test_bevstereo_occ_eval_cli(tmp_path, capsys):
    """tools/test.py on the BEVStereo4DOCC baseline, synthetic data, fresh
    init (no checkpoint): must trace, run and print an mIoU line."""
    cfg_path = tmp_path / "bevstereo_tiny.py"
    cfg_path.write_text(BEVSTEREO_TINY_CFG)
    run_cli(
        os.path.join(REPO, "tools", "test.py"),
        [str(cfg_path), "--synthetic", "--num-samples", "2",
         "--eval", "miou", "fscore"],
    )
    cap = capsys.readouterr()
    out = (cap.out + cap.err).lower()
    assert "miou" in out
    # --eval fscore merges chamfer accuracy/completeness/f1 into results
    assert "fscore" in out and "completeness" in out


TRAJ_TINY_CFG = """
grid_config = dict(
    x=[-8.0, 8.0, 0.8], y=[-8.0, 8.0, 0.8], z=[-1.0, 5.4, 0.8],
    depth=[1.0, 9.0, 0.5],
)
data_config = dict(input_size=(64, 128), Ncams=1)
model = dict(
    type="PreWorld4DTraj",
    backbone="swin",
    swin=dict(embed_dims=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
              window_size=4),
    neck_out_channels=24,
    num_trans_channels=8,
    out_dim=8,
    if_post_finetune=True,
    if_render=False,
    use_lss_depth_loss=False,
    test_future=6,
)
data = dict(samples_per_gpu=1, workers_per_gpu=0,
            train=dict(max_ray_nums=64))
log_interval = 1
runner = dict(max_epochs=1)
"""


NUPLAN_TINY_CFG = """
grid_config = dict(
    x=[-8.0, 8.0, 0.8], y=[-8.0, 8.0, 0.8], z=[-1.0, 5.4, 0.8],
    depth=[1.0, 9.0, 0.5],
)
data_config = dict(input_size=(64, 128), Ncams=1)
model = dict(
    type="PreWorld",
    backbone="swin",
    swin=dict(embed_dims=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
              window_size=4),
    neck_out_channels=24,
    num_trans_channels=8,
    out_dim=8,
    num_classes=12,
    empty_idx=11,
    if_post_finetune=False,
    if_render=True,
    use_lss_depth_loss=False,
    nerf_head=dict(
        point_cloud_range=[-8.0, -8.0, -1.0, 8.0, 8.0, 5.4], radius=8
    ),
)
data = dict(samples_per_gpu=1, workers_per_gpu=0,
            train=dict(max_ray_nums=64))
log_interval = 1
runner = dict(max_epochs=1)
"""


@pytest.mark.slow
def test_nuplan_taxonomy_train_cli(tmp_path):
    """tools/train.py on the nuPlan 12-class taxonomy (the OpenScene
    pretraining task, BASELINE config 5): rendering pretrain step with
    uniform 11-semantic-class weights + zero empty class must trace and
    produce finite losses (metrics.jsonl written)."""
    import json

    cfg_path = tmp_path / "nuplan_tiny.py"
    cfg_path.write_text(NUPLAN_TINY_CFG)
    work = tmp_path / "work"
    run_cli(
        os.path.join(REPO, "tools", "train.py"),
        [str(cfg_path), "--synthetic", "--max-iters", "1",
         "--work-dir", str(work)],
    )
    lines = (work / "metrics.jsonl").read_text().strip().splitlines()
    rec = json.loads(lines[-1])
    assert all(
        v == v and abs(v) < 1e6 for k, v in rec.items()
        if isinstance(v, float)
    ), rec


@pytest.mark.slow
def test_temporal_eval_cli(tmp_path, capsys):
    """tools/test_temporal.py (reference horizon protocol) on a tiny 4D
    traj model, synthetic data, fresh init."""
    cfg_path = tmp_path / "traj_tiny.py"
    cfg_path.write_text(TRAJ_TINY_CFG)
    run_cli(
        os.path.join(REPO, "tools", "test_temporal.py"),
        [str(cfg_path), "--synthetic", "--num-samples", "2"],
    )
    out = capsys.readouterr()
    assert "miou" in (out.out + out.err).lower()
