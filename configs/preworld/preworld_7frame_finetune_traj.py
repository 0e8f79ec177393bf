# 4-D forecasting stage 2: supervised occupancy + trajectory fine-tune.
# Counterpart of `configs/preworld/nuscenes-temporal/preworld-7frame-finetune-traj.py`.

_base_ = ["./preworld_7frame_finetune.py"]

model = dict(
    type="PreWorld4DTraj",
)

data = dict(
    train=dict(
        max_ray_nums=19200,
        ego_gt_path="data/admlp/stp3_val/data_nuscene.pkl",
        traj_gt_path="data/occworld/nuscenes_infos_train_temporal_v3_scene.pkl",
    ),
    val=dict(
        ego_gt_path="data/admlp/stp3_val/data_nuscene.pkl",
        traj_gt_path="data/occworld/nuscenes_infos_val_temporal_v3_scene.pkl",
    ),
)

runner = dict(max_epochs=18)
