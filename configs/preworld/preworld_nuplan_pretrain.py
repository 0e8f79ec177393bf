# OpenScene/nuPlan large-scale pretraining (task #5 / BASELINE config 5).
# The reference never shipped this config (README 'coming soon'); built per
# SURVEY.md §2: same model, nuPlan grid + 12-class taxonomy, rendering
# pretrain over 15k scenes.

_base_ = ["./preworld_7frame_pretrain.py"]

grid_config = dict(
    x=[-50.0, 50.0, 0.5],
    y=[-50.0, 50.0, 0.5],
    z=[-4.0, 4.0, 0.5],
    depth=[1.0, 45.0, 0.5],
)

model = dict(
    dataset_type="NuPlan",
    num_classes=12,
    empty_idx=11,
    nerf_head=dict(
        point_cloud_range=[-50.0, -50.0, -4.0, 50.0, 50.0, 4.0],
        radius=49,
        bwd_live_cap=64,  # exact two-tier compaction; see preworld_7frame_pretrain.py
    ),
)

data = dict(
    dataset_type="NuPlan",
    data_root="data/openscene/",
    train=dict(ann_file="data/openscene/openscene_infos_train.pkl"),
    val=dict(ann_file="data/openscene/openscene_infos_val.pkl"),
    test=dict(ann_file="data/openscene/openscene_infos_val.pkl"),
)

runner = dict(max_epochs=6)
