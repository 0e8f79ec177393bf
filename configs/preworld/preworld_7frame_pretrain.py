# Stage 1: self-supervised pre-training via volume rendering.
# Counterpart of `configs/preworld/nuscenes/preworld-7frame-pretrain.py`.

_base_ = ["./bevstereo_occ.py"]

model = dict(
    if_pretrain=True,
    if_render=True,
    if_post_finetune=False,
    use_lss_depth_loss=True,
    weight_voxel_ce=0.0,
    weight_voxel_sem_scal=0.0,
    weight_voxel_geo_scal=0.0,
    weight_voxel_lovasz=0.0,
    nerf_head=dict(
        point_cloud_range=[-40.0, -40.0, -1.0, 40.0, 40.0, 5.4],
        voxel_size=0.4,
        radius=39,
        use_depth_sup=True,
        weight_depth=1.0,
        weight_semantic=1.0,
        weight_color=1.0,
        weight_entropy_last=0.01,
        weight_distortion=0.01,
        # exact TWO-TIER live-sample compaction of the render backward
        # scatter (ops/field_sample.py::_corner8_scatter_grad): tier 1
        # scatters a contiguous <=cap-sample window over each ray's live
        # span; rays whose span exceeds the cap (~12% of live rays on a
        # realistic scene — wall-grazing transmittance chains) are
        # scattered whole in a k_over = R/8 tier 2 pass; only >k_over
        # overflowing rays (e.g. a fully transparent random-init field)
        # trips the full-scatter fallback. Exact on every branch.
        # cap 64 measured (r4): realistic-scene full render grad
        # 876 -> 696 ms; cap 128 compacts less (854). The r3 single-tier
        # cap never engaged at flagship scale (docs/ROUND3_STATUS.md).
        bwd_live_cap=64,
    ),
)

data = dict(
    samples_per_gpu=2,
    train=dict(
        use_rays=True,
        aux_frames=[-3, -2, -1, 1, 2, 3],
        max_ray_nums=38400,
        depth_gt_path="data/depth_gt",
        semantic_gt_path="data/seg_gt_lidarseg",
    ),
)

runner = dict(max_epochs=6)
log_interval = 10
