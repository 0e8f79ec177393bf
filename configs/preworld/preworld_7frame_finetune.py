# Stage 2: supervised occupancy fine-tuning (resumes from pretrain).
# Counterpart of `configs/preworld/nuscenes/preworld-7frame-finetune.py`.

_base_ = ["./bevstereo_occ.py"]

model = dict(
    if_pretrain=False,
    if_render=False,
    if_post_finetune=True,
    use_lss_depth_loss=False,
    weight_voxel_ce=1.0,
    weight_voxel_sem_scal=1.0,
    weight_voxel_geo_scal=1.0,
    weight_voxel_lovasz=1.0,
    use_focal_loss=True,
)

data = dict(
    samples_per_gpu=2,
    train=dict(
        use_rays=False,
        aux_frames=[-3, -2, -1, 1, 2, 3],
        max_ray_nums=38400,
    ),
)

runner = dict(max_epochs=12)
log_interval = 10
