"""Explicit config -> model construction (replaces mmcv registry dispatch).

The reference assembles models by registry-name lookup
(`mmdet3d/models/builder.py`); here a plain function maps the config tree to
the `PreWorldConfig` dataclass.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..geometry.frustum import GridConfig
from ..models.nerf_head import NerfHeadConfig
from ..models.preworld import PreWorld, PreWorldConfig
from ..models.preworld_traj import PreWorld4DTraj
from ..ops.render import RaySamplingSpec


def build_grid_config(grid_cfg: Dict[str, Any]) -> GridConfig:
    return GridConfig(
        x=tuple(grid_cfg["x"]),
        y=tuple(grid_cfg["y"]),
        z=tuple(grid_cfg["z"]),
        depth=tuple(grid_cfg["depth"]),
    )


def build_nerf_config(nerf_cfg: Dict[str, Any], world_len: int) -> NerfHeadConfig:
    pcr = tuple(nerf_cfg.get("point_cloud_range", (-40, -40, -1, 40, 40, 5.4)))
    spec = RaySamplingSpec(
        point_cloud_range=pcr,
        radius=float(nerf_cfg.get("radius", 39)),
        step_size=float(nerf_cfg.get("step_size", 0.5)),
        world_len=world_len,
    )
    return NerfHeadConfig(
        spec=spec,
        use_depth_sup=bool(nerf_cfg.get("use_depth_sup", True)),
        weight_depth=float(nerf_cfg.get("weight_depth", 1.0)),
        weight_semantic=float(nerf_cfg.get("weight_semantic", 1.0)),
        weight_color=float(nerf_cfg.get("weight_color", 1.0)),
        weight_entropy_last=float(nerf_cfg.get("weight_entropy_last", 0.01)),
        weight_distortion=float(nerf_cfg.get("weight_distortion", 0.01)),
        fast_color_thres=float(nerf_cfg.get("fast_color_thres", 1e-7)),
        balance_cls_weight=bool(nerf_cfg.get("balance_cls_weight", True)),
        max_depth=float(nerf_cfg.get("max_depth", 52.0)),
        variance_focus=float(nerf_cfg.get("variance_focus", 0.85)),
        table_dtype=str(nerf_cfg.get("table_dtype", "auto")),
        ray_chunk=int(nerf_cfg.get("ray_chunk", 0)),
        bwd_live_cap=int(nerf_cfg.get("bwd_live_cap", 0)),
    )


def build_model(cfg) -> PreWorld:
    """cfg: a `preworld_tpu.utils.Config` with model/grid_config/data_config."""
    grid = build_grid_config(cfg["grid_config"])
    m = cfg["model"]
    swin = m.get("swin", {})
    nerf_cfg = m.get("nerf_head", {})
    world_len = int(grid.size[0])
    model_cfg = PreWorldConfig(
        grid=grid,
        input_size=tuple(cfg["data_config"]["input_size"]),
        num_cams=int(cfg["data_config"]["Ncams"]),
        temporal_frames=int(m.get("temporal_frames", 2)),
        extra_ref_frames=int(m.get("extra_ref_frames", 1)),
        backbone=m.get("backbone", "swin"),
        swin_embed_dims=int(swin.get("embed_dims", 128)),
        swin_depths=tuple(swin.get("depths", (2, 2, 18, 2))),
        swin_num_heads=tuple(swin.get("num_heads", (4, 8, 16, 32))),
        swin_window=int(swin.get("window_size", 12)),
        neck_out_channels=int(m.get("neck_out_channels", 512)),
        num_trans_channels=int(m.get("num_trans_channels", 32)),
        num_classes=int(m.get("num_classes", 18)),
        out_dim=int(m.get("out_dim", 32)),
        test_threshold=float(m.get("test_threshold", 8.5)),
        empty_idx=int(m.get("empty_idx", m.get("num_classes", 18) - 1)),
        if_pretrain=bool(m.get("if_pretrain", False)),
        if_render=bool(m.get("if_render", True)),
        if_post_finetune=bool(m.get("if_post_finetune", False)),
        use_lss_depth_loss=bool(m.get("use_lss_depth_loss", True)),
        depth_loss_weight=float(m.get("depth_loss_weight", 0.05)),
        balance_cls_weight=bool(m.get("balance_cls_weight", True)),
        weight_voxel_ce=float(m.get("weight_voxel_ce", 1.0)),
        weight_voxel_sem_scal=float(m.get("weight_voxel_sem_scal", 1.0)),
        weight_voxel_geo_scal=float(m.get("weight_voxel_geo_scal", 1.0)),
        weight_voxel_lovasz=float(m.get("weight_voxel_lovasz", 1.0)),
        use_focal_loss=bool(m.get("use_focal_loss", True)),
        nerf=build_nerf_config(nerf_cfg, world_len),
        remat=bool(m.get("remat", False)),
        dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            m.get("dtype", "float32")
        ],
    )
    mtype = m.get("type", "PreWorld")
    if mtype == "PreWorld4DTraj":
        return PreWorld4DTraj(model_cfg)
    if mtype == "BEVStereo4DOCC":
        from ..models.bevstereo_occ import BEVStereoOCC

        return BEVStereoOCC(model_cfg)
    return PreWorld(model_cfg)
