from .layers import ConvNormAct, BasicBlock, Mlp, SELayer, MlpSequence, upsample
from .resnet import CustomResNet, CustomResNet3D
from .fpn import FPN_LSS, LSSFPN3D
from .depthnet import DepthNet, ASPP, gen_stereo_grid, stereo_cost_volume
from .view_transformer import (
    LSSViewTransformer,
    get_mlp_input,
    depth_bce_loss,
    downsampled_gt_depth,
)
from .occ_head import OccHead, DownScale3D
from .nerf_head import (
    NerfHeadConfig,
    nerf_head_losses,
    render_scene,
    nusc_class_weights,
)
from .swin import SwinTransformer
from .preworld import PreWorld, PreWorldConfig, TinyBackbone
from .preworld_traj import PreWorld4DTraj, rollout_curriculum
from .bevstereo_occ import BEVStereoOCC
from .temporal_align import shift_voxel_feature, ego_motion_grid

__all__ = [
    "ConvNormAct", "BasicBlock", "Mlp", "SELayer", "MlpSequence", "upsample",
    "CustomResNet", "CustomResNet3D", "FPN_LSS", "LSSFPN3D",
    "DepthNet", "ASPP", "gen_stereo_grid", "stereo_cost_volume",
    "LSSViewTransformer", "get_mlp_input", "depth_bce_loss",
    "downsampled_gt_depth", "OccHead", "DownScale3D",
    "NerfHeadConfig", "nerf_head_losses", "render_scene",
    "nusc_class_weights", "SwinTransformer",
    "PreWorld", "PreWorldConfig", "TinyBackbone",
    "PreWorld4DTraj", "rollout_curriculum", "BEVStereoOCC",
    "shift_voxel_feature", "ego_motion_grid",
]
