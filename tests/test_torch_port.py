"""Round-trip test of the torch->flax checkpoint converter.

Builds a synthetic torch state_dict whose shapes are derived from the real
flax init (via the inverse weight transforms), converts it, and checks that
every ported tensor lands on an existing flax leaf with the right shape and
that coverage of the warm-started modules is complete.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from preworld_tpu.data import synthetic_batch
from preworld_tpu.models import PreWorld, PreWorldConfig
from preworld_tpu.utils.torch_port import (
    convert_full_model,
    full_model_key_map,
    merge_trees,
    swin_key_map,
    verify_tree_shapes,
)


def small_swin_cfg():
    return PreWorldConfig(
        input_size=(64, 128),
        num_cams=1,
        backbone="swin",
        swin_embed_dims=16,
        swin_depths=(1, 1, 1, 1),
        swin_num_heads=(1, 2, 4, 8),
        swin_window=4,
        neck_out_channels=24,
        num_trans_channels=8,
        out_dim=8,
        if_post_finetune=True,
        if_render=False,
        use_lss_depth_loss=False,
    )


@pytest.fixture(scope="module")
def template_tree():
    cfg = small_swin_cfg()
    model = PreWorld(cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, 1, 64, with_labels=False).items()
    }
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=False,
        )
    )
    return cfg, model, batch, shapes


def _get(tree, path):
    node = tree
    for p in path:
        if p not in node:
            return None
        node = node[p]
    return node


def _walk(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def inverse_swin_key(path):
    """flax path under img_backbone -> torch key (inverse of swin_key_map)."""
    p = list(path)
    if p[0] == "patch_embed":
        return "patch_embed.projection." + (
            "weight" if p[1] == "kernel" else "bias"
        )
    if p[0] == "patch_norm":
        return "patch_embed.norm." + ("weight" if p[1] == "scale" else "bias")
    m = re.match(r"out_norm(\d)", p[0])
    if m:
        return f"norm{m.group(1)}." + ("weight" if p[1] == "scale" else "bias")
    m = re.match(r"downsample(\d)", p[0])
    if m:
        if p[1] == "norm":
            return (
                f"stages.{m.group(1)}.downsample.norm."
                + ("weight" if p[2] == "scale" else "bias")
            )
        return f"stages.{m.group(1)}.downsample.reduction.weight"
    m = re.match(r"stage(\d+)_block(\d+)", p[0])
    assert m, path
    base = f"stages.{m.group(1)}.blocks.{m.group(2)}"
    rest = p[1:]
    if rest[0] in ("norm1", "norm2"):
        return f"{base}.{rest[0]}." + ("weight" if rest[1] == "scale" else "bias")
    if rest[0] == "attn":
        if rest[1] == "relative_position_bias_table":
            return f"{base}.attn.w_msa.relative_position_bias_table"
        leaf = "weight" if rest[2] == "kernel" else "bias"
        return f"{base}.attn.w_msa.{rest[1]}.{leaf}"
    if rest[0] == "mlp_fc1":
        leaf = "weight" if rest[1] == "kernel" else "bias"
        return f"{base}.ffn.layers.0.0.{leaf}"
    if rest[0] == "mlp_fc2":
        leaf = "weight" if rest[1] == "kernel" else "bias"
        return f"{base}.ffn.layers.1.{leaf}"
    raise AssertionError(path)


def torch_shape_for(flax_path_leaf, shape):
    """Inverse weight-transform: flax leaf shape -> torch tensor shape."""
    leaf = flax_path_leaf[-1]
    if leaf == "kernel":
        if len(shape) == 2:  # dense
            return (shape[1], shape[0])
        # conv (*k, I, O) -> (O, I, *k)
        return (shape[-1], shape[-2]) + tuple(shape[:-2])
    return tuple(shape)


class TestTorchPort:
    def test_full_round_trip(self, template_tree):
        cfg, model, batch, shapes = template_tree
        params_t = shapes["params"]
        stats_t = shapes.get("batch_stats", {})

        state_dict = {}
        # swin part
        for path, leaf in _walk(params_t["img_backbone"]):
            key = "img_backbone." + inverse_swin_key(path)
            state_dict[key] = np.random.default_rng(0).normal(
                size=torch_shape_for(path, leaf.shape)
            ).astype(np.float32)
        # rest via the forward key map (invert transforms per kind)
        kmap = full_model_key_map()
        for tprefix, (fpath, kind) in kmap.items():
            sub = _get(params_t, fpath)
            if sub is None:
                continue
            if kind == "bn":
                state_dict[tprefix + ".weight"] = np.ones(sub["scale"].shape, np.float32)
                state_dict[tprefix + ".bias"] = np.zeros(sub["bias"].shape, np.float32)
                bsub = _get(stats_t, fpath)
                state_dict[tprefix + ".running_mean"] = np.zeros(
                    bsub["mean"].shape, np.float32
                )
                state_dict[tprefix + ".running_var"] = np.ones(
                    bsub["var"].shape, np.float32
                )
            elif kind in ("conv", "linear", "dense1x1"):
                ks = sub["kernel"].shape
                if kind == "conv":
                    tshape = (ks[-1], ks[-2]) + tuple(ks[:-2])
                elif kind == "linear":
                    tshape = (ks[1], ks[0])
                else:
                    tshape = (ks[1], ks[0], 1, 1)
                state_dict[tprefix + ".weight"] = np.zeros(tshape, np.float32)
                if "bias" in sub:
                    state_dict[tprefix + ".bias"] = np.zeros(
                        sub["bias"].shape, np.float32
                    )

        params, stats = convert_full_model(state_dict)
        bad = verify_tree_shapes(params_t, params)
        assert not bad, bad[:10]
        bad_s = verify_tree_shapes(stats_t, stats)
        assert not bad_s, bad_s[:10]

        # coverage: every warm-started module leaf must be ported
        for mod in ("img_backbone", "img_neck", "view_transformer",
                    "bev_backbone", "bev_neck", "pre_process"):
            want = dict(_walk(params_t[mod]))
            got = dict(_walk(params.get(mod, {})))
            missing = set(want) - set(got)
            assert not missing, (mod, sorted(missing)[:10])

        # the merged tree must actually run
        init = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )
        merged_params = merge_trees(
            init["params"],
            jax.tree_util.tree_map(jnp.asarray, params),
        )
        merged_stats = merge_trees(
            init.get("batch_stats", {}),
            jax.tree_util.tree_map(jnp.asarray, stats),
        )
        out = model.apply(
            {"params": merged_params, "batch_stats": merged_stats},
            {k: v for k, v in batch.items()},
            train=False,
        )
        assert "semantic_occ" in out
