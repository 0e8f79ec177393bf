"""End-to-end tiny-fixture tests: loss finiteness, gradient flow, predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from preworld_tpu.data import synthetic_batch, tiny_config
from preworld_tpu.models import PreWorld
from preworld_tpu.train import create_train_state, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def pretrain_setup():
    cfg = tiny_config(
        if_pretrain=True, if_render=True, if_post_finetune=False,
        use_lss_depth_loss=True,
    )
    model = PreWorld(cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 2, 256).items()}
    tx = make_optimizer()
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    return cfg, model, batch, tx, state


class TestPretrainStage:
    def test_loss_keys_and_finiteness(self, pretrain_setup):
        cfg, model, batch, tx, state = pretrain_setup
        losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
        )
        expected = {
            "loss_render_depth", "loss_render_semantic", "loss_render_color",
            "loss_sdf_entropy", "loss_sdf_distortion", "loss_lss_depth",
        }
        assert expected == set(losses)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_train_step_updates_and_grad_flow(self, pretrain_setup):
        cfg, model, batch, tx, state = pretrain_setup
        step = jax.jit(make_train_step(model, tx))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_total"]))
        assert float(metrics["grad_norm"]) > 0
        # every pretrain-path param leaf must receive gradient (non-identical)
        flat_old = jax.tree_util.tree_leaves_with_path(state.params)
        flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
        changed = moved = 0
        untouched = []
        for path, old in flat_old:
            new = flat_new[path]
            moved += 1
            if not np.allclose(np.asarray(old), np.asarray(new)):
                changed += 1
            else:
                untouched.append(jax.tree_util.keystr(path))
        # occupancy head gets no grad in pretrain (loss skipped); all else must
        frac = changed / moved
        assert frac > 0.6, f"only {frac:.2f} of params updated; e.g. {untouched[:8]}"

    def test_ema_and_step_advance(self, pretrain_setup):
        cfg, model, batch, tx, state = pretrain_setup
        step = jax.jit(make_train_step(model, tx))
        s1, _ = step(state, batch, jax.random.PRNGKey(1))
        assert int(s1.step) == 1 and int(s1.ema_updates) == 1


class TestFinetuneStage:
    def test_finetune_losses(self):
        cfg = tiny_config(
            if_pretrain=False, if_render=False, if_post_finetune=True,
            use_lss_depth_loss=False,
        )
        model = PreWorld(cfg)
        batch = {
            k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, 128).items()
        }
        tx = make_optimizer()
        state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
        losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
        )
        expected = {
            "loss_voxel_ce", "loss_voxel_sem", "loss_voxel_geo",
            "loss_voxel_lovasz",
        }
        assert expected == set(losses)
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, float(v))

    def test_predict_shapes_and_range(self):
        cfg = tiny_config(if_post_finetune=True, if_render=False,
                          use_lss_depth_loss=False)
        model = PreWorld(cfg)
        train_batch = {
            k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, 128).items()
        }
        tx = make_optimizer()
        state = create_train_state(model, train_batch, tx, jax.random.PRNGKey(0))
        infer_batch = {
            k: v for k, v in train_batch.items()
            if k in ("imgs", "sensor2egos", "ego2globals", "intrins",
                     "post_rots", "post_trans", "bda")
        }
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            infer_batch, train=False,
        )
        sx, sy, sz = (int(v) for v in cfg.grid.size)
        assert out["semantic_occ"].shape == (1, sx, sy, sz)
        occ = np.asarray(out["semantic_occ"])
        assert occ.min() >= 0 and occ.max() <= 17


class TestMultiDevice:
    def test_dp_sp_train_step(self):
        """Full train step jitted over a (data=4, seq=2) virtual mesh."""
        from preworld_tpu.parallel import make_mesh, shard_batch, replicate_sharding

        cfg = tiny_config(if_pretrain=True, if_render=True,
                          use_lss_depth_loss=True)
        model = PreWorld(cfg)
        mesh = make_mesh(n_data=4, n_seq=2)
        batch_np = synthetic_batch(cfg, 4, 256)
        tx = make_optimizer()
        state = create_train_state(
            model, {k: jnp.asarray(v) for k, v in batch_np.items()}, tx,
            jax.random.PRNGKey(0),
        )
        rep = replicate_sharding(mesh)
        state = jax.device_put(state, rep)
        batch = shard_batch(mesh, batch_np)
        step = jax.jit(make_train_step(model, tx))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_total"]))
        assert int(new_state.step) == 1


class TestSequentialStreaming:
    def test_two_streaming_steps(self):
        """predict_sequential: cache init + 2 steps, finite int outputs."""
        cfg = tiny_config(if_post_finetune=True, if_render=False,
                          use_lss_depth_loss=False)
        model = PreWorld(cfg)
        full = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, 64).items()}
        from preworld_tpu.train import create_train_state, make_optimizer

        state = create_train_state(model, full, make_optimizer(),
                                   jax.random.PRNGKey(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def frame_batch(t):
            return {
                "imgs": full["imgs"][:, t],
                "sensor2egos": full["sensor2egos"][:, t],
                "ego2globals": full["ego2globals"][:, t],
                "intrins": full["intrins"][:, t],
                "post_rots": full["post_rots"][:, t],
                "post_trans": full["post_trans"][:, t],
                "bda": full["bda"],
            }

        cache = model.apply(
            variables, frame_batch(0), method=model.init_sequential_cache
        )
        for t in (0, 1):
            out, cache = model.apply(
                variables, frame_batch(t), cache,
                method=model.predict_sequential,
            )
            sx, sy, sz = (int(v) for v in cfg.grid.size)
            assert out["semantic_occ"].shape == (1, sx, sy, sz)
            occ = np.asarray(out["semantic_occ"])
            assert occ.min() >= 0 and occ.max() <= 17
        assert cache["bev_feat"].shape[0] == 1


class TestStreamingConsistency:
    def test_streaming_converges_to_full_forward(self):
        """After the cache warms (2 steps), the streaming path's prediction
        matches the full 3-frame forward on the same synthetic sequence
        (VERDICT r3 next #10).

        With CONSTANT ego pose the two paths are algebraically equal: the
        streaming prev-BEV ego alignment (shift_voxel_feature) is the
        identity, and the cached frame-B voxel feature was computed with
        stereo reference A — exactly what the full forward computes for its
        adjacent frame. Streaming is the reference `accelerate` mode analog
        (`view_transformer.py:155-174`, `bevdet.py:373-396`)."""
        import numpy as np

        cfg = tiny_config(if_post_finetune=True, if_render=False,
                          use_lss_depth_loss=False)
        model = PreWorld(cfg)
        full_np = synthetic_batch(cfg, 1, 64)
        for k in ("sensor2egos", "ego2globals", "intrins", "post_rots",
                  "post_trans"):
            full_np[k] = np.repeat(np.asarray(full_np[k][:, :1]), 3, axis=1)
        full = {k: jnp.asarray(v) for k, v in full_np.items()}
        from preworld_tpu.train import create_train_state, make_optimizer

        state = create_train_state(
            model, full, make_optimizer(), jax.random.PRNGKey(0),
            fast_init=True,
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def frame_batch(t):
            return {
                "imgs": full["imgs"][:, t],
                "sensor2egos": full["sensor2egos"][:, t],
                "ego2globals": full["ego2globals"][:, t],
                "intrins": full["intrins"][:, t],
                "post_rots": full["post_rots"][:, t],
                "post_trans": full["post_trans"][:, t],
                "bda": full["bda"],
            }

        # stream in time order: prev2 (t=2), prev (t=1), key (t=0)
        cache = model.apply(
            variables, frame_batch(2), method=model.init_sequential_cache
        )
        out_s = None
        for t in (2, 1, 0):
            out_s, cache = model.apply(
                variables, frame_batch(t), cache,
                method=model.predict_sequential,
            )

        infer = {
            k: full[k]
            for k in ("imgs", "sensor2egos", "ego2globals", "intrins",
                      "post_rots", "post_trans", "bda")
        }
        out_f = model.apply(variables, infer, train=False)

        occ_s = np.asarray(out_s["semantic_occ"])
        occ_f = np.asarray(out_f["semantic_occ"])
        agree = (occ_s == occ_f).mean()
        # identical math up to resampling-order f32 noise; argmax ties can
        # flip isolated voxels
        assert agree >= 0.99, f"streaming/full agreement {agree:.4f}"


class TestShiftFeature:
    def test_identity_motion_is_identity(self):
        """Zero ego motion => shift_voxel_feature is (interior) identity."""
        from preworld_tpu.geometry import GridConfig
        from preworld_tpu.models.temporal_align import shift_voxel_feature

        grid = GridConfig(x=(-8, 8, 1.0), y=(-8, 8, 1.0), z=(0, 4, 1.0))
        rng = np.random.default_rng(0)
        feat = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 3)).astype(np.float32))
        pose = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 2, 1, 1))
        out = shift_voxel_feature(feat, pose, pose, jnp.eye(3)[None], grid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-4)

    def test_translation_shifts_cells(self):
        """1-cell ego translation in x moves features by one X cell."""
        from preworld_tpu.geometry import GridConfig
        from preworld_tpu.models.temporal_align import shift_voxel_feature

        grid = GridConfig(x=(-8, 8, 1.0), y=(-8, 8, 1.0), z=(0, 4, 1.0))
        rng = np.random.default_rng(1)
        feat = jnp.asarray(rng.normal(size=(1, 1, 16, 16, 2)).astype(np.float32))
        curr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 1, 1, 1))
        prev = curr.at[:, :, 0, 3].add(1.0)  # prev cam sits 1 m ahead in x
        out = np.asarray(
            shift_voxel_feature(
                feat, curr, prev, jnp.eye(3)[None], grid
            )
        )
        ref = np.asarray(feat)
        # current cell x should sample prev feature at x - 1 cell
        np.testing.assert_allclose(
            out[0, 0, :, 1:, :], ref[0, 0, :, :-1, :], atol=1e-4
        )


class TestBEVStereoOCCBaseline:
    def test_loss_and_predict(self):
        from preworld_tpu.models import BEVStereoOCC

        cfg = tiny_config(if_post_finetune=False, if_render=False,
                          use_lss_depth_loss=True)
        model = BEVStereoOCC(cfg)
        batch = {
            k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, 64).items()
        }
        state = create_train_state(model, batch, make_optimizer(),
                                   jax.random.PRNGKey(0))
        losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
        )
        assert set(losses) == {"loss_occ", "loss_depth"}
        for v in losses.values():
            assert np.isfinite(float(v))
        infer = {
            k: v for k, v in batch.items()
            if k in ("imgs", "sensor2egos", "ego2globals", "intrins",
                     "post_rots", "post_trans", "bda")
        }
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            infer, train=False,
        )
        sx, sy, sz = (int(v) for v in cfg.grid.size)
        assert out["semantic_occ"].shape == (1, sx, sy, sz)


class TestEvalToggles:
    """--fuse-conv-bn and align_after_view_transformation (aavt) parity
    toggles (reference tools/test.py:48,82,211,220-221)."""

    @pytest.fixture(scope="class")
    def toggle_setup(self):
        cfg = tiny_config(if_post_finetune=True, if_render=False,
                          use_lss_depth_loss=False)
        model = PreWorld(cfg)
        train_batch = {
            k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, 128).items()
        }
        tx = make_optimizer()
        state = create_train_state(
            model, train_batch, tx, jax.random.PRNGKey(0)
        )
        # non-trivial batch stats (fresh init has mean 0 / var 1 and would
        # make the fold vacuous)
        import flax

        stats = jax.tree_util.tree_map(
            lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(
                a.shape
            ) / max(a.size, 1),
            flax.core.unfreeze(state.batch_stats),
        )
        state = state.replace(batch_stats=stats)
        infer = {
            k: v for k, v in train_batch.items()
            if k in ("imgs", "sensor2egos", "ego2globals", "intrins",
                     "post_rots", "post_trans", "bda")
        }
        return cfg, model, state, infer

    def test_fold_conv_bn_is_exact(self, toggle_setup):
        import flax

        from preworld_tpu.utils.fold_bn import fold_conv_bn

        cfg, model, state, infer = toggle_setup
        ref = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            infer, train=False,
        )
        p, s = fold_conv_bn(
            flax.core.unfreeze(state.params),
            flax.core.unfreeze(state.batch_stats),
        )
        # at least one kernel must actually have been rescaled
        changed = jax.tree_util.tree_reduce(
            lambda acc, x: acc or bool(x),
            jax.tree_util.tree_map(
                lambda a, b: bool(jnp.any(a != b)),
                flax.core.unfreeze(state.params), p,
            ),
            False,
        )
        assert changed
        out = model.apply(
            {"params": p, "batch_stats": s}, infer, train=False
        )
        # integer argmax predictions must agree ~everywhere (float assoc
        # can flip exact argmax ties on random weights)
        agree = (np.asarray(out["semantic_occ"])
                 == np.asarray(ref["semantic_occ"])).mean()
        assert agree > 0.995, agree

    def test_aavt_path_runs_and_matches_closely(self, toggle_setup):
        cfg, model, state, infer = toggle_setup
        ref = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            infer, train=False,
        )
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            infer,
            method=lambda m, b: m.predict(b, align_after_vt=True),
        )
        occ = np.asarray(out["semantic_occ"])
        assert occ.shape == np.asarray(ref["semantic_occ"]).shape
        assert occ.min() >= 0 and occ.max() <= 17
        # shift-based alignment resamples the adjacent BEV feature; at
        # 0.4 m/frame ego motion predictions stay largely consistent
        agree = (occ == np.asarray(ref["semantic_occ"])).mean()
        assert agree > 0.7, agree
