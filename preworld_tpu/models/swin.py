"""Swin Transformer backbone (Swin-B "stbase" config) in flax.linen.

Parity: `mmdet3d/models/backbones/swin.py` (mmcv/mmseg variant) with the
PreWorld config (`configs/preworld/nuscenes/bevstereo-occ.py:45-67`):
embed 128, depths [2,2,18,2], heads [4,8,16,32], window 12, out_indices
(2,3), `return_stereo_feat=True` additionally emits the stage-0
(pre-downsample) feature for the stereo cost volume (`swin.py:946-971`).

TPU-first notes: channel-last throughout; window partition is pure reshape;
the shifted-window attention mask is computed in numpy at trace time (static
shapes); PatchMerging matches mmcv's unfold channel ordering (c*4 + kh*2 +
kw) so torch checkpoints port by transpose only.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(wins: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    C = wins.shape[-1]
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_position_index(ws: int) -> np.ndarray:
    """Standard Swin relative-position index table, (ws*ws, ws*ws)."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shifted_window_region_ids(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Per-token shift-region ids for SW-MSA, (nW, ws*ws) float32."""
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    return m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)


def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> jnp.ndarray:
    """Attention mask for SW-MSA: (nW, ws*ws, ws*ws) with 0 / -100.

    Built ON DEVICE from the small (nW, ws*ws) region-id table: embedding
    the full (nW, N, N) mask as a literal (~27 MB at flagship stage 0)
    crashes the TPU compile when it feeds a Pallas call, and XLA's
    constant folding would re-literalize a pure-constant expression — the
    optimization barrier on the small table prevents both.
    """
    ids = jax.lax.optimization_barrier(
        jnp.asarray(shifted_window_region_ids(H, W, ws, shift))
    )
    return jnp.where(
        ids[:, None, :] != ids[:, :, None], jnp.float32(-100.0),
        jnp.float32(0.0),
    )


class WindowMSA(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, fused=False, band=False):
        """x: (nW*B, N, C) — or (B, Hp, Wp, C) image layout when `band`;
        mask: (nW, N, N) or None; fused selects the Pallas fused-attention
        kernel; band additionally uses the band kernel that consumes/emits
        the image layout directly (no window partition/reverse relayouts —
        see ops/window_attn_pallas.py band section)."""
        if band:
            B, Hp, Wp, C = x.shape
            ws = self.window_size
            N = ws * ws
            h = self.num_heads
            qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                           name="qkv")(x)
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02),
                ((2 * ws - 1) ** 2, h),
            )
            idx = relative_position_index(ws)
            bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
            from ..ops.window_attn_pallas import band_window_attention_vjp

            out = band_window_attention_vjp(qkv, bias, mask, h, ws)
            return nn.Dense(C, dtype=self.dtype, name="proj")(out)

        Bn, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        scale = head_dim**-0.5
        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        # keep (Bn, N, h, d) layouts and fold head into dot_general batch
        # dims — the torch-style transpose(2,0,3,1,4) materializes three
        # (Bn, h, N, d) copies that XLA won't always fuse away
        qkv = qkv.reshape(Bn, N, 3, h, head_dim)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)

        if fused:
            from ..ops.window_attn_pallas import fused_window_attention_vjp

            # custom_vjp wrapper: identical kernel forward; flash-style
            # recompute backward (so the fused path is valid in training)
            out = fused_window_attention_vjp(
                qkv.reshape(Bn, N, 3 * C), bias, mask, h
            )
            return nn.Dense(C, dtype=self.dtype, name="proj")(out)

        q = qkv[:, :, 0] * scale
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k)
        attn = attn + bias[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(Bn, h, N, N)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: bool
    mlp_ratio: int = 4
    drop_path: float = 0.0
    use_fused_attn: Any = None  # None = auto (TPU inference); bool forces
    use_fused_mlp: Any = None  # None = auto (TPU inference); bool forces
    use_band_attn: Any = None  # None = auto (with fused attn, C % 128 == 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        H, W = hw
        if x.ndim == 4:
            # stage-persistent padded layout (B, Hp, Wp, C): one fused
            # kernel computes LN1 -> zero-pad -> qkv -> window attention ->
            # proj -> +residual (ops/swin_block_pallas.py); pad/slice
            # happen once per STAGE in SwinTransformer, not per block.
            return self._mlp_subblock(
                self._fused_attn_padded(x, hw, train), train
            )
        B, L, C = x.shape
        ws = min(self.window_size, H, W)
        shift = ws // 2 if (self.shift and ws < min(H, W)) else 0

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = y.reshape(B, H, W, C)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = shifted_window_mask(Hp, Wp, ws, shift)
        else:
            mask = None
        # fused Pallas attention on TPU; the flash-style custom VJP
        # (window_attn_pallas.fused_window_attention_vjp) covers training
        # too. use_fused_attn overrides the backend auto-detect (trace-time
        # default_backend is wrong for an explicitly CPU-placed jit on a
        # TPU host). N = ws*ws must be 16-aligned for the kernel's
        # sublane-offset hint.
        fused = self.use_fused_attn
        if fused is None:
            fused = jax.default_backend() == "tpu"
        fused = fused and (ws * ws) % 16 == 0
        # band kernel: consumes/emits the padded (B, Hp, Wp, .) image layout
        # directly, so window partition/reverse relayouts (XLA materializes
        # ~5-7 full-size copies per block for the 6-D transposes) vanish.
        # Needs lane-aligned channels for the in-kernel head slices.
        band = self.use_band_attn
        if band is None:
            band = fused
        band = band and fused and C % 128 == 0
        msa = WindowMSA(
            self.dim, self.num_heads, ws, dtype=self.dtype, name="attn"
        )
        if band:
            y = msa(y, mask, band=True)  # (B, Hp, Wp, C)
        else:
            wins = window_partition(y, ws)
            wins = msa(wins, mask, fused=fused)
            y = window_reverse(wins, ws, Hp, Wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :H, :W].reshape(B, L, C)
        x = shortcut + _drop_path(y, self.drop_path, train, self, "dp1")
        return self._mlp_subblock(x, train)

    def _fused_attn_padded(self, x, hw, train):
        """Attention half-block on the padded (B, Hp, Wp, C) layout, one
        Pallas kernel (LN1 + zero-pad + qkv + window MSA + proj +
        residual); the shift rides two cheap XLA rolls. Param tree is
        checkpoint-identical to the legacy path (dummy calls)."""
        from ..ops.swin_block_pallas import fused_swin_attn_block_vjp

        H, W = hw
        B, Hp, Wp, C = x.shape
        ws = min(self.window_size, H, W)
        shift = ws // 2 if (self.shift and ws < min(H, W)) else 0
        N = ws * ws
        h = self.num_heads
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        _ = norm1(jnp.zeros((1, 1, C), self.dtype))
        msa = WindowMSA(self.dim, h, ws, dtype=self.dtype, name="attn")
        _ = msa(jnp.zeros((1, N, C), self.dtype))
        pn = norm1.variables["params"]
        pm = msa.variables["params"]
        table = pm["relative_position_bias_table"]
        idx = relative_position_index(ws)
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        if shift > 0:
            xk = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = shifted_window_mask(Hp, Wp, ws, shift)
        else:
            xk, mask = x, None
        row_scale = None
        if train and self.drop_path > 0.0:
            keep = 1.0 - self.drop_path
            m = jax.random.bernoulli(self.make_rng("dropout"), keep, (B,))
            row_scale = m.astype(jnp.float32) / keep
        y = fused_swin_attn_block_vjp(
            xk, pn["scale"], pn["bias"],
            pm["qkv"]["kernel"].astype(self.dtype),
            pm["qkv"]["bias"],
            pm["proj"]["kernel"].astype(self.dtype),
            pm["proj"]["bias"],
            bias, mask, row_scale, h, ws, H, W, shift, False,
        )
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        return y

    def _mlp_subblock(self, x, train):
        """LN2 + MLP + residual; x is (B, L, C) or padded (B, Hp, Wp, C)."""
        C = x.shape[-1]
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        fc1 = nn.Dense(C * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")
        fc2 = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")
        # fused LN2+MLP+residual Pallas kernel on TPU: the XLA path
        # round-trips the 4C-wide hidden activation through HBM (the
        # largest single traffic term in the backbone); the kernel streams
        # row tiles through LN -> fc1 -> GELU -> fc2 -> +residual in VMEM.
        # The custom VJP (swin_mlp_pallas.fused_swin_mlp_vjp) covers
        # training; drop_path enters as the kernel's per-row branch scale.
        # C must be lane-aligned (128) for the weight/block layouts.
        fused_mlp = self.use_fused_mlp
        if fused_mlp is None:
            fused_mlp = jax.default_backend() == "tpu"
        fused_mlp = fused_mlp and C % 128 == 0
        if fused_mlp:
            from ..ops.swin_mlp_pallas import fused_swin_mlp_vjp

            # dummy 1-token call creates the params (checkpoint-identical
            # tree); XLA dead-code-eliminates the result
            _ = fc2(nn.gelu(fc1(norm2(jnp.zeros((1, 1, C), self.dtype))),
                            approximate=False))
            pn = norm2.variables["params"]
            p1 = fc1.variables["params"]
            p2 = fc2.variables["params"]
            row_scale = None
            if train and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                m = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (x.shape[0],)
                )
                row_scale = jnp.broadcast_to(
                    (m.astype(jnp.float32) / keep).reshape(
                        (-1,) + (1,) * (x.ndim - 2)
                    ),
                    x.shape[:-1],
                ).reshape(-1)
            # custom_vjp is positional-only: (..., row_scale, block_rows,
            # hidden_chunk, interpret)
            return fused_swin_mlp_vjp(
                x,
                pn["scale"], pn["bias"],
                p1["kernel"].astype(self.dtype), p1["bias"].astype(self.dtype),
                p2["kernel"].astype(self.dtype), p2["bias"].astype(self.dtype),
                row_scale, 2048, 512, False,
            )
        y = norm2(x)
        y = fc1(y)
        y = nn.gelu(y, approximate=False)
        y = fc2(y)
        return x + _drop_path(y, self.drop_path, train, self, "dp2")


def _drop_path(x, rate, train, module: nn.Module, name: str):
    """Stochastic depth (per-sample) as in timm/mmcv."""
    if rate == 0.0 or not train:
        return x
    rng = module.make_rng("dropout")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class PatchMerging(nn.Module):
    """2x2 unfold + LN + Linear(4C -> 2C) (mmcv ordering: c*4 + kh*2 + kw)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        H, W = hw
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        pad_b, pad_r = H % 2, W % 2
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        H2, W2 = (H + pad_b) // 2, (W + pad_r) // 2
        x = x.reshape(B, H2, 2, W2, 2, C)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, H2 * W2, C * 4)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return x, (H2, W2)


class SwinTransformer(nn.Module):
    """Swin backbone; returns features of out_indices (+ optional stage-0)."""

    embed_dims: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 12
    mlp_ratio: int = 4
    patch_size: int = 4
    out_indices: Sequence[int] = (2, 3)
    drop_path_rate: float = 0.1
    return_stereo_feat: bool = True
    patch_norm: bool = True
    use_fused_attn: Any = None  # None = auto (TPU inference); bool forces
    use_fused_mlp: Any = None  # None = auto (TPU inference); bool forces
    use_band_attn: Any = None  # None = auto (see SwinBlock)
    use_block_attn: Any = None  # None = auto: fully-fused attention
    # half-block on a stage-persistent padded layout (swin_block_pallas)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x, train: bool = False, stage0_only: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        """x: (B, H, W, 3) -> tuple of (B, h, w, C_i) channel-last features,
        prefixed by the stage-0 stereo feature when return_stereo_feat.

        stage0_only: run just patch-embed + stage 0 and return (feat0,) —
        the stereo-reference path (`bevdet.py:589-603`)."""
        B = x.shape[0]
        x = nn.Conv(
            self.embed_dims,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        H, W = x.shape[1], x.shape[2]
        x = x.reshape(B, H * W, self.embed_dims)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth)
        outs = []
        hw = (H, W)
        dim = self.embed_dims
        blk_id = 0
        for i, depth in enumerate(self.depths):
            # stage-persistent padded layout: when the fully-fused block
            # kernel applies (TPU, lane-aligned C, 16-aligned window area),
            # pad ONCE per stage and run every block on (B, Hp, Wp, C) —
            # per-block pad/slice/partition relayouts disappear into the
            # kernel's band DMA (see ops/swin_block_pallas.py)
            Hs, Ws = hw
            ws_i = min(self.window_size, Hs, Ws)
            blk = self.use_block_attn
            if blk is None:
                blk = self.use_fused_attn
                if blk is None:
                    blk = jax.default_backend() == "tpu"
            blk = blk and dim % 128 == 0 and (ws_i * ws_i) % 16 == 0
            if blk:
                pad_b = (ws_i - Hs % ws_i) % ws_i
                pad_r = (ws_i - Ws % ws_i) % ws_i
                xs = x.reshape(B, Hs, Ws, dim)
                if pad_b or pad_r:
                    xs = jnp.pad(
                        xs, ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
                    )
                for j in range(depth):
                    xs = SwinBlock(
                        dim,
                        self.num_heads[i],
                        self.window_size,
                        shift=(j % 2 == 1),
                        mlp_ratio=self.mlp_ratio,
                        drop_path=float(dpr[blk_id]),
                        use_fused_attn=self.use_fused_attn,
                        use_fused_mlp=self.use_fused_mlp,
                        use_band_attn=self.use_band_attn,
                        dtype=self.dtype,
                        name=f"stage{i}_block{j}",
                    )(xs, hw, train)
                    blk_id += 1
                x = xs[:, :Hs, :Ws].reshape(B, Hs * Ws, dim)
            else:
                for j in range(depth):
                    x = SwinBlock(
                        dim,
                        self.num_heads[i],
                        self.window_size,
                        shift=(j % 2 == 1),
                        mlp_ratio=self.mlp_ratio,
                        drop_path=float(dpr[blk_id]),
                        use_fused_attn=self.use_fused_attn,
                        use_fused_mlp=self.use_fused_mlp,
                        use_band_attn=self.use_band_attn,
                        dtype=self.dtype,
                        name=f"stage{i}_block{j}",
                    )(x, hw, train)
                    blk_id += 1
            out = x  # pre-downsample stage output (mmcv convention)
            out_hw = hw
            if i < len(self.depths) - 1:
                x, hw = PatchMerging(dim * 2, dtype=self.dtype,
                                     name=f"downsample{i}")(x, hw)
                dim *= 2
            if i == 0 and (self.return_stereo_feat or stage0_only):
                outs.append(out.reshape(B, *out_hw, out.shape[-1]))
                if stage0_only:
                    return tuple(outs)
            if i in self.out_indices:
                normed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{i}")(out)
                outs.append(normed.reshape(B, *out_hw, normed.shape[-1]))
        return tuple(outs)
