"""End-to-end warm-start proof (VERDICT r2 next #4).

Builds a reference-shaped torch state_dict at tiny scale, saves it as a
.pth, runs the REAL CLI chain — tools/convert_torch_checkpoint.py then
tools/train.py --load-from --synthetic --max-iters 1 — and asserts (a) the
training step produced finite losses and (b) the ported torch weights
survived into the stepped checkpoint (distinguishable from the fresh init).

Reference chain being proven: `configs/preworld/nuscenes/bevstereo-occ.py:257`
(load_from = bevdet-stbase warm start) + `mmdet3d/apis/train.py:308-318`
(strict=False load into the detector).
"""

import json
import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_torch_port import _get, _walk, inverse_swin_key, torch_shape_for

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = """
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
    if_post_finetune=True,
    if_render=False,
    use_lss_depth_loss=False,
)
data = dict(samples_per_gpu=1, workers_per_gpu=0,
            train=dict(max_ray_nums=64))
log_interval = 1
runner = dict(max_epochs=1)
"""


from conftest import run_cli as _run_cli  # noqa: E402


@pytest.mark.slow
def test_torch_ckpt_to_train_step(tmp_path):
    torch = pytest.importorskip("torch")

    cfg_path = tmp_path / "tiny_cfg.py"
    cfg_path.write_text(TINY_CFG)

    from preworld_tpu.data import synthetic_batch
    from preworld_tpu.train import create_train_state, make_optimizer
    from preworld_tpu.train.builder import build_model
    from preworld_tpu.utils import Config
    from preworld_tpu.utils.torch_port import full_model_key_map

    cfg = Config.fromfile(str(cfg_path))
    model = build_model(cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(model.cfg, 1, 64).items()
    }
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=True,
        )
    )
    params_t, stats_t = shapes["params"], shapes.get("batch_stats", {})

    # reference-shaped state_dict with a recognizable deterministic pattern
    rng = np.random.default_rng(11)
    state_dict = {}
    for path, leaf in _walk(params_t["img_backbone"]):
        shp = torch_shape_for(path, leaf.shape)
        state_dict["img_backbone." + inverse_swin_key(path)] = (
            rng.normal(0, 0.05, size=shp).astype(np.float32)
        )
    for tprefix, (fpath, kind) in full_model_key_map().items():
        sub = _get(params_t, fpath)
        if sub is None:
            continue
        if kind == "bn":
            state_dict[tprefix + ".weight"] = np.ones(
                sub["scale"].shape, np.float32)
            state_dict[tprefix + ".bias"] = np.zeros(
                sub["bias"].shape, np.float32)
            bsub = _get(stats_t, fpath)
            state_dict[tprefix + ".running_mean"] = np.zeros(
                bsub["mean"].shape, np.float32)
            state_dict[tprefix + ".running_var"] = np.ones(
                bsub["var"].shape, np.float32)
        else:
            ks = sub["kernel"].shape
            if kind == "conv":
                tshape = (ks[-1], ks[-2]) + tuple(ks[:-2])
            elif kind == "linear":
                tshape = (ks[1], ks[0])
            else:
                tshape = (ks[1], ks[0], 1, 1)
            state_dict[tprefix + ".weight"] = rng.normal(
                0, 0.05, size=tshape).astype(np.float32)
            if "bias" in sub:
                state_dict[tprefix + ".bias"] = np.zeros(
                    sub["bias"].shape, np.float32)

    # the marker leaf we track through the whole chain
    pe_key = "img_backbone.patch_embed.projection.weight"
    marker = state_dict[pe_key]

    pth = tmp_path / "tiny_stbase.pth"
    torch.save(
        {"state_dict": {k: torch.from_numpy(v) for k, v in state_dict.items()}},
        str(pth),
    )

    out_pkl = tmp_path / "ported.pkl"
    _run_cli(os.path.join(REPO, "tools", "convert_torch_checkpoint.py"),
             [str(pth), str(out_pkl)])
    with open(out_pkl, "rb") as fh:
        ported = pickle.load(fh)
    # converter applied the (O, I, kh, kw) -> (kh, kw, I, O) transform
    np.testing.assert_allclose(
        np.asarray(ported["params"]["img_backbone"]["patch_embed"]["kernel"]),
        marker.transpose(2, 3, 1, 0),
    )

    work_dir = tmp_path / "wd"
    _run_cli(
        os.path.join(REPO, "tools", "train.py"),
        [str(cfg_path), "--synthetic", "--max-iters", "1", "--epochs", "1",
         "--load-from", str(out_pkl), "--work-dir", str(work_dir)],
    )

    # (a) the step logged finite losses
    recs = [json.loads(l) for l in
            open(work_dir / "metrics.jsonl").read().splitlines()]
    assert recs and np.isfinite(recs[0]["loss_total"]), recs
    assert "loss_voxel_ce" in recs[0]

    # (b) the ported weights survived into the stepped checkpoint: restore
    # and compare the marker leaf — one warmup-lr step moves it by ~1e-6,
    # while a fresh init would differ at the weight scale
    from preworld_tpu.train.checkpoints import restore_checkpoint

    tx = make_optimizer()
    template = create_train_state(
        model, batch, tx, jax.random.PRNGKey(0))
    restored = restore_checkpoint(
        str(work_dir / "checkpoints"), template)
    assert restored is not None and int(restored.step) == 1
    got = np.asarray(
        restored.params["img_backbone"]["patch_embed"]["kernel"])
    want = marker.transpose(2, 3, 1, 0)
    assert np.abs(got - want).max() < 1e-2, np.abs(got - want).max()
    # and it is not just the fresh init
    fresh = np.asarray(
        template.params["img_backbone"]["patch_embed"]["kernel"])
    assert np.abs(fresh - want).max() > 1e-2
