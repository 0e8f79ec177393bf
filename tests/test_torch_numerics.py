"""Activation-level torch->flax port parity tests.

Each test builds a torch test double replicating the REFERENCE architecture
exactly (module structure, key names, eps, activation order — transcribed
from `/root/reference/mmdet3d/models/backbones/swin.py`,
`necks/view_transformer.py:355-638`, `backbones/resnet.py:88-184`),
randomly initializes it, exports its state_dict under the reference key
names, converts with `preworld_tpu.utils.torch_port`, and asserts the flax
module produces the same activations on the same input. This is the
numerics test the round-1 shape/coverage round-trip could not provide: a
single transposed kernel, wrong unfold order, or BN/LN epsilon mismatch
fails these at 1e-4.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from preworld_tpu.models.depthnet import DepthNet
from preworld_tpu.models.resnet import CustomResNet3D
from preworld_tpu.models.swin import SwinTransformer
from preworld_tpu.utils.torch_port import convert_full_model, convert_swin

torch.manual_seed(0)
RTOL, ATOL = 2e-4, 2e-4


def _randomize_bn_stats(mod):
    """Random (not identity) running stats so eval-mode BN is a sharp test."""
    g = torch.Generator().manual_seed(7)
    for m in mod.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


def _np_state_dict(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


# ---------------------------------------------------------------------------
# torch test doubles (reference-architecture transcriptions)
# ---------------------------------------------------------------------------


class TWindowMSA(tnn.Module):
    """Reference WindowMSA (`swin.py:244-349`)."""

    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02
        )
        seq1 = torch.arange(0, (2 * ws - 1) * ws, 2 * ws - 1)
        seq2 = torch.arange(0, ws)
        rel = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
        idx = (rel + rel.T).flip(1).contiguous()
        self.register_buffer("relative_position_index", idx)

    def forward(self, x, mask=None):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.heads, C // self.heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B // nW, nW, self.heads, N, N) + mask[None, :, None]
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TAttn(tnn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.w_msa = TWindowMSA(dim, heads, ws)


class TFFN(tnn.Module):
    """mmcv FFN key layout: layers.0.0 (fc1) / layers.1 (fc2)."""

    def __init__(self, dim, ratio=4):
        super().__init__()
        self.layers = tnn.ModuleList(
            [tnn.Sequential(tnn.Linear(dim, dim * ratio)), tnn.Linear(dim * ratio, dim)]
        )

    def forward(self, x):
        return self.layers[1](torch.nn.functional.gelu(self.layers[0][0](x)))


class TSwinBlock(tnn.Module):
    """Reference SwinBlock incl. ShiftWindowMSA roll/mask (`swin.py:352-560`)."""

    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.ws, self.shift_on = ws, shift
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = TAttn(dim, heads, ws)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.ffn = TFFN(dim)

    def forward(self, x, hw):
        H, W = hw
        B, L, C = x.shape
        ws = self.ws
        shift = ws // 2 if (self.shift_on and ws < min(H, W)) else 0
        shortcut = x
        y = self.norm1(x).view(B, H, W, C)
        if shift > 0:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
            img_mask = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            m = img_mask.view(1, H // ws, ws, W // ws, ws, 1)
            m = m.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
            mask = m[:, None, :] - m[:, :, None]
            mask = torch.where(mask != 0, torch.tensor(-100.0), torch.tensor(0.0))
        else:
            mask = None
        wins = y.view(B, H // ws, ws, W // ws, ws, C)
        wins = wins.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
        wins = self.attn.w_msa(wins, mask)
        y = wins.view(B, H // ws, W // ws, ws, ws, C)
        y = y.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        if shift > 0:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = shortcut + y.view(B, L, C)
        return x + self.ffn(self.norm2(x))


class TPatchMerging(tnn.Module):
    """mmcv PatchMerging: unfold(k=2,s=2) + LN + Linear(4C->2C, no bias)."""

    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim, eps=1e-5)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, hw):
        H, W = hw
        B, L, C = x.shape
        x = x.view(B, H, W, C).permute(0, 3, 1, 2)
        x = torch.nn.functional.unfold(x, kernel_size=2, stride=2)  # (B,4C,L')
        x = x.transpose(1, 2)  # (B, L', 4C)
        return self.reduction(self.norm(x)), (H // 2, W // 2)


class TPatchEmbed(tnn.Module):
    def __init__(self, embed):
        super().__init__()
        self.projection = tnn.Conv2d(3, embed, 4, 4)
        self.norm = tnn.LayerNorm(embed, eps=1e-5)


class TStage(tnn.Module):
    def __init__(self, dim, depth, heads, ws, has_down):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TSwinBlock(dim, heads, ws, shift=(j % 2 == 1)) for j in range(depth)]
        )
        self.downsample = TPatchMerging(dim) if has_down else None


class TSwin(tnn.Module):
    """Tiny reference-structured Swin: depths (2,2), out_indices (1,),
    return_stereo_feat stage-0 output."""

    def __init__(self, embed=16, heads=(1, 2), ws=4):
        super().__init__()
        self.patch_embed = TPatchEmbed(embed)
        self.stages = tnn.ModuleList(
            [
                TStage(embed, 2, heads[0], ws, has_down=True),
                TStage(embed * 2, 2, heads[1], ws, has_down=False),
            ]
        )
        self.norm1 = tnn.LayerNorm(embed * 2, eps=1e-5)

    def forward(self, img):
        x = self.patch_embed.projection(img)
        B, C, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        hw = (H, W)
        outs = []
        for i, stage in enumerate(self.stages):
            for blk in stage.blocks:
                x = blk(x, hw)
            out, out_hw = x, hw
            if stage.downsample is not None:
                x, hw = stage.downsample(x, hw)
            if i == 0:  # stereo feat, raw pre-downsample (`swin.py:946-971`)
                outs.append(
                    out.view(B, *out_hw, -1).permute(0, 3, 1, 2)
                )
            if i == 1:
                normed = self.norm1(out)
                outs.append(
                    normed.view(B, *out_hw, -1).permute(0, 3, 1, 2)
                )
        return outs


class TestSwinParity:
    def test_full_tiny_swin(self):
        tmodel = TSwin().eval()
        img = torch.randn(2, 3, 32, 64)
        with torch.no_grad():
            t_stereo, t_out = tmodel(img)

        sd = {"img_backbone." + k: v.numpy() for k, v in tmodel.state_dict().items()}
        params, _ = convert_swin(sd)
        fmodel = SwinTransformer(
            embed_dims=16, depths=(2, 2), num_heads=(1, 2), window_size=4,
            out_indices=(1,), drop_path_rate=0.0, return_stereo_feat=True,
        )
        f_stereo, f_out = fmodel.apply(
            {"params": params},
            jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(f_stereo).transpose(0, 3, 1, 2), t_stereo.numpy(),
            rtol=RTOL, atol=ATOL,
        )
        np.testing.assert_allclose(
            np.asarray(f_out).transpose(0, 3, 1, 2), t_out.numpy(),
            rtol=RTOL, atol=ATOL,
        )


# ---------------------------------------------------------------------------
# DepthNet (stereo=False, dcn=False) — `view_transformer.py:471-638`
# ---------------------------------------------------------------------------


class TMlp(tnn.Module):
    def __init__(self, i, h, o):
        super().__init__()
        self.fc1 = tnn.Linear(i, h)
        self.fc2 = tnn.Linear(h, o)

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(x)))


class TSE(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(c, c, 1, bias=True)
        self.conv_expand = tnn.Conv2d(c, c, 1, bias=True)

    def forward(self, x, x_se):
        x_se = self.conv_expand(torch.relu(self.conv_reduce(x_se)))
        return x * torch.sigmoid(x_se)


class TBasicBlock2D(tnn.Module):
    """mmdet BasicBlock: conv-bn-relu-conv-bn (+identity) relu."""

    def __init__(self, c_in, c, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(c_in, c, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(c)
        self.conv2 = tnn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(c)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TASPPModule(tnn.Module):
    def __init__(self, c_in, c, k, pad, dil):
        super().__init__()
        self.atrous_conv = tnn.Conv2d(c_in, c, k, 1, pad, dil, bias=False)
        self.bn = tnn.BatchNorm2d(c)

    def forward(self, x):
        return torch.relu(self.bn(self.atrous_conv(x)))


class TASPP(tnn.Module):
    def __init__(self, inplanes, mid):
        super().__init__()
        self.aspp1 = TASPPModule(inplanes, mid, 1, 0, 1)
        self.aspp2 = TASPPModule(inplanes, mid, 3, 6, 6)
        self.aspp3 = TASPPModule(inplanes, mid, 3, 12, 12)
        self.aspp4 = TASPPModule(inplanes, mid, 3, 18, 18)
        self.global_avg_pool = tnn.Sequential(
            tnn.AdaptiveAvgPool2d((1, 1)),
            tnn.Conv2d(inplanes, mid, 1, bias=False),
            tnn.BatchNorm2d(mid),
            tnn.ReLU(),
        )
        self.conv1 = tnn.Conv2d(mid * 5, inplanes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(inplanes)

    def forward(self, x):
        xs = [self.aspp1(x), self.aspp2(x), self.aspp3(x), self.aspp4(x)]
        x5 = self.global_avg_pool(x)
        x5 = torch.nn.functional.interpolate(
            x5, size=xs[-1].shape[2:], mode="bilinear", align_corners=True
        )
        y = torch.cat(xs + [x5], dim=1)
        return torch.relu(self.bn1(self.conv1(y)))


class TDepthNet(tnn.Module):
    def __init__(self, c_in, mid, ctx, d, aspp_mid):
        super().__init__()
        self.reduce_conv = tnn.Sequential(
            tnn.Conv2d(c_in, mid, 3, 1, 1), tnn.BatchNorm2d(mid), tnn.ReLU()
        )
        self.context_conv = tnn.Conv2d(mid, ctx, 1)
        self.bn = tnn.BatchNorm1d(27)
        self.depth_mlp = TMlp(27, mid, mid)
        self.depth_se = TSE(mid)
        self.context_mlp = TMlp(27, mid, mid)
        self.context_se = TSE(mid)
        self.depth_conv = tnn.Sequential(
            TBasicBlock2D(mid, mid),
            TBasicBlock2D(mid, mid),
            TBasicBlock2D(mid, mid),
            TASPP(mid, aspp_mid),
            tnn.Conv2d(mid, d, 1),
        )

    def forward(self, x, mlp_input):
        mlp_input = self.bn(mlp_input.reshape(-1, mlp_input.shape[-1]))
        x = self.reduce_conv(x)
        ctx_se = self.context_mlp(mlp_input)[..., None, None]
        context = self.context_conv(self.context_se(x, ctx_se))
        d_se = self.depth_mlp(mlp_input)[..., None, None]
        depth = self.depth_conv(self.depth_se(x, d_se))
        return torch.cat([depth, context], dim=1)


class TestDepthNetParity:
    def test_depthnet_no_stereo(self):
        mid, ctx, d, c_in, aspp_mid = 16, 8, 6, 12, 10
        tmodel = TDepthNet(c_in, mid, ctx, d, aspp_mid).eval()
        _randomize_bn_stats(tmodel)
        x = torch.randn(2, c_in, 8, 10)
        mlp = torch.randn(2, 27)
        with torch.no_grad():
            t_out = tmodel(x, mlp)

        sd = {
            "img_view_transformer.depth_net." + k: v
            for k, v in _np_state_dict(tmodel).items()
        }
        params, stats = convert_full_model(sd)
        sub_p = params["view_transformer"]["depth_net"]
        sub_s = stats["view_transformer"]["depth_net"]
        fmodel = DepthNet(
            mid_channels=mid, context_channels=ctx, depth_channels=d,
            use_aspp=True, aspp_mid_channels=aspp_mid, stereo=False,
        )
        f_out = fmodel.apply(
            {"params": sub_p, "batch_stats": sub_s},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(mlp.numpy()),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(f_out).transpose(0, 3, 1, 2), t_out.numpy(),
            rtol=RTOL, atol=ATOL,
        )


# ---------------------------------------------------------------------------
# CustomResNet3D (BEV voxel encoder) — `backbones/resnet.py:88-184`
# ---------------------------------------------------------------------------


class TConvModule3D(tnn.Module):
    def __init__(self, c_in, c, stride=1, act=True):
        super().__init__()
        self.conv = tnn.Conv3d(c_in, c, 3, stride, 1, bias=False)
        self.bn = tnn.BatchNorm3d(c)
        self.act = act

    def forward(self, x):
        y = self.bn(self.conv(x))
        return torch.relu(y) if self.act else y


class TBasicBlock3D(tnn.Module):
    def __init__(self, c_in, c, stride=1, downsample=None):
        super().__init__()
        self.conv1 = TConvModule3D(c_in, c, stride)
        self.conv2 = TConvModule3D(c, c, 1, act=False)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        return torch.relu(self.conv2(self.conv1(x)) + idn)


class TCustomResNet3D(tnn.Module):
    def __init__(self, c_in=8, num_layer=(1, 2), channels=(16, 32), stride=(1, 2)):
        super().__init__()
        layers = []
        cur = c_in
        for n, c, s in zip(num_layer, channels, stride):
            blocks = [
                TBasicBlock3D(cur, c, s, downsample=TConvModule3D(cur, c, s, act=False))
            ]
            blocks += [TBasicBlock3D(c, c) for _ in range(n - 1)]
            layers.append(tnn.Sequential(*blocks))
            cur = c
        self.layers = tnn.Sequential(*layers)

    def forward(self, x):
        feats = []
        for layer in self.layers:
            x = layer(x)
            feats.append(x)
        return feats


class TestResNet3DParity:
    def test_bev_backbone(self):
        tmodel = TCustomResNet3D().eval()
        _randomize_bn_stats(tmodel)
        x = torch.randn(1, 8, 4, 8, 8)  # (B, C, D, H, W)
        with torch.no_grad():
            t_feats = tmodel(x)

        sd = {
            "img_bev_encoder_backbone." + k: v
            for k, v in _np_state_dict(tmodel).items()
        }
        params, stats = convert_full_model(sd, num_bev_layers=(1, 2))
        fmodel = CustomResNet3D(
            num_layer=(1, 2), num_channels=(16, 32), stride=(1, 2),
            backbone_output_ids=(0, 1),
        )
        f_feats = fmodel.apply(
            {"params": params["bev_backbone"],
             "batch_stats": stats["bev_backbone"]},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
            train=False,
        )
        for tf, ff in zip(t_feats, f_feats):
            np.testing.assert_allclose(
                np.asarray(ff).transpose(0, 4, 1, 2, 3), tf.numpy(),
                rtol=RTOL, atol=ATOL,
            )


class TestCostVolumeTorchOracle:
    def test_cost_volume_matches_reference_loop(self):
        """stereo_cost_volume vs a line-for-line torch transcription of the
        reference `calculate_cost_volumn` group loop
        (`necks/view_transformer.py:576-604`), including the quirk that the
        invalid-warp bias keys on channel 0 of the LAST 4-channel group
        (global channel C-4) — pinned by planting an exact zero in the
        warped field at channel 0 but not at C-4."""
        import torch.nn.functional as F

        from preworld_tpu.models.depthnet import stereo_cost_volume

        rng = np.random.default_rng(11)
        BN, H, W, C, D = 2, 8, 12, 8, 5
        prev = rng.normal(size=(BN, H, W, C)).astype(np.float32)
        curr = rng.normal(size=(BN, H, W, C)).astype(np.float32)
        # exact zeros in channel 0 at some in-image texels: with integer
        # warps below these produce warped[...,0]==0 while channel C-4
        # stays nonzero -> the bias must NOT trigger there
        prev[:, 2:4, 3:6, 0] = 0.0
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        gx = np.zeros((BN, D, H, W), np.float32)
        gy = np.zeros((BN, D, H, W), np.float32)
        for d in range(D):
            # integer shifts keep warps exact-texel (hits the planted zeros)
            gx[:, d] = (xs + d - 1) / (W - 1) * 2 - 1
            gy[:, d] = (ys + (d % 2)) / (H - 1) * 2 - 1
        grid = np.stack([gx, gy], -1).reshape(BN, D * H, W, 2)

        # ---- reference transcription (torch, channel-first) ----
        tprev = torch.from_numpy(prev).permute(0, 3, 1, 2)
        tcurr = torch.from_numpy(curr).permute(0, 3, 1, 2)
        tgrid = torch.from_numpy(grid)
        bias = 5.0
        group = 4
        cost = 0
        for fid in range(C // group):
            pc = tprev[:, fid * group:(fid + 1) * group]
            wrap_prev = F.grid_sample(pc, tgrid, align_corners=True,
                                      padding_mode="zeros")
            cc = tcurr[:, fid * group:(fid + 1) * group]
            tmp = cc.unsqueeze(2) - wrap_prev.view(BN, group, D, H, W)
            cost = cost + tmp.abs().sum(dim=1)
        invalid = wrap_prev[:, 0].view(BN, D, H, W) == 0
        cost[invalid] = cost[invalid] + bias
        ref = torch.softmax(-cost, dim=1).numpy()

        ours = np.asarray(
            stereo_cost_volume(
                jnp.asarray(prev), jnp.asarray(curr), jnp.asarray(grid),
                bias=bias, depth_chunk=1,
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
        # the quirk actually fired: some texels are zero in channel 0 but
        # valid per the reference's C-4 probe
        wp_full = F.grid_sample(tprev, tgrid, align_corners=True,
                                padding_mode="zeros").view(BN, C, D, H, W)
        ch0_zero = wp_full[:, 0] == 0
        assert bool((ch0_zero & ~invalid).any()), "degenerate fixture"
