# Base config: BEVStereo-style occupancy model on Occ3D-nuScenes.
# Counterpart of the reference's `configs/preworld/nuscenes/bevstereo-occ.py`.

data_config = dict(
    cams=[
        "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT",
    ],
    Ncams=6,
    input_size=(512, 1408),
    src_size=(900, 1600),
    # augmentation (train)
    resize=(-0.06, 0.11),
    rot=(-5.4, 5.4),
    flip=True,
    crop_h=(0.0, 0.0),
    resize_test=0.0,
)

grid_config = dict(
    x=[-40.0, 40.0, 0.4],
    y=[-40.0, 40.0, 0.4],
    z=[-1.0, 5.4, 0.4],
    depth=[1.0, 45.0, 0.5],
)

numC_Trans = 32

model = dict(
    type="PreWorld",
    backbone="swin",
    # TPU execution policy: bf16 compute in the backbone/encoder (heads stay
    # f32) + segment rematerialization so the train step fits 16 GB HBM
    dtype="bfloat16",
    remat=True,
    swin=dict(
        embed_dims=128,
        depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32),
        window_size=12,
    ),
    neck_out_channels=512,
    num_trans_channels=numC_Trans,
    out_dim=32,
    num_classes=18,
    temporal_frames=2,
    extra_ref_frames=1,
    test_threshold=8.5,
)

bda_aug_conf = dict(
    rot_lim=(-0.0, 0.0),
    scale_lim=(1.0, 1.0),
    flip_dx_ratio=0.5,
    flip_dy_ratio=0.5,
)

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    data_root="data/nuscenes/",
    train=dict(
        ann_file="data/nuscenes/bevdetv2-nuscenes_infos_train.pkl",
        use_rays=False,
    ),
    val=dict(ann_file="data/nuscenes/bevdetv2-nuscenes_infos_val.pkl"),
    test=dict(ann_file="data/nuscenes/bevdetv2-nuscenes_infos_val.pkl"),
)

optimizer = dict(type="AdamW", lr=1e-4, weight_decay=1e-2)
optimizer_config = dict(grad_clip=dict(max_norm=5, norm_type=2))
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=200, warmup_ratio=0.001,
    step=[100],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)

ema = dict(decay=0.999, init_updates=10560)
log_interval = 50
checkpoint_interval = 1
seed = 0
