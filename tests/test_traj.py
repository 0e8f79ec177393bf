"""End-to-end tests for the 4-D forecasting model (PreWorld4DTraj)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from preworld_tpu.data import synthetic_batch, tiny_config
from preworld_tpu.models.preworld_traj import (
    PreWorld4DTraj,
    l2_traj_loss,
    rollout_curriculum,
)
from preworld_tpu.train import create_train_state, make_optimizer


class TestCurriculum:
    def test_matches_reference_schedule(self):
        """`preworld_temporal_traj.py:440-449`."""
        assert rollout_curriculum(0, True) == 2
        assert rollout_curriculum(2, True) == 2
        assert rollout_curriculum(3, True) == 2  # min(3-1, 6)
        assert rollout_curriculum(5, True) == 4
        assert rollout_curriculum(9, True) == 6
        assert rollout_curriculum(4, False) == 2
        assert rollout_curriculum(5, False) == 2  # (5-3)//2+1
        assert rollout_curriculum(13, False) == 6

    def test_l2(self):
        a = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        b = jnp.zeros((2, 2))
        # mean over batch per coord then sum: (1+9)/2 + (4+16)/2 = 15
        assert float(l2_traj_loss(a, b)) == 15.0


@pytest.fixture(scope="module")
def traj_setup():
    cfg = tiny_config(
        if_pretrain=False, if_render=False, if_post_finetune=True,
        use_lss_depth_loss=False,
    )
    model = PreWorld4DTraj(cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, 1, 128, with_traj=True).items()
    }
    tx = make_optimizer()
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    return cfg, model, batch, state


class TestTrajModel:
    def test_rollout_losses(self, traj_setup):
        cfg, model, batch, state = traj_setup
        losses = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, num_future=2,
        )
        for h in ("_0s", "_1s", "_2s"):
            assert any(k.endswith(h) for k in losses), (h, list(losses))
        assert "loss_traj_1s" in losses and "loss_traj_2s" in losses
        assert not any(k.endswith("_3s") for k in losses)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_rollout_predict(self, traj_setup):
        cfg, model, batch, state = traj_setup
        infer = {
            k: v for k, v in batch.items()
            if k in ("imgs", "sensor2egos", "ego2globals", "intrins",
                     "post_rots", "post_trans", "bda", "ego_states")
        }
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            infer, train=False,
        )
        assert set(out) == {f"semantic_occ_{k}s" for k in range(7)}
        sx, sy, sz = (int(v) for v in cfg.grid.size)
        for v in out.values():
            assert v.shape == (1, sx, sy, sz)
            assert int(v.min()) >= 0 and int(v.max()) <= 17

    def test_grad_flows_to_traj_heads(self, traj_setup):
        cfg, model, batch, state = traj_setup

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=False, num_future=1,
            )
            return sum(jax.tree_util.tree_leaves(out))

        grads = jax.grad(loss_fn)(state.params)
        for head in ("plan_head", "fusion_head", "traj_head",
                     "ego_fusion_head", "downscale"):
            g = jax.tree_util.tree_leaves(grads[head])
            assert any(float(jnp.abs(x).max()) > 0 for x in g), head


class TestBatchedTemporalEval:
    def test_batched_sharded_matches_serial(self, traj_setup):
        """evaluate_miou_temporal (batched over the 8-device mesh, padded
        last batch) must produce IDENTICAL mIoU to the serial batch-1 loop
        it replaced (VERDICT r2 next #6). Reference serial loop:
        mmdet3d/apis/test.py:198-259."""
        from preworld_tpu.metrics import MetricMIoUTemporal
        from preworld_tpu.parallel import make_mesh
        from preworld_tpu.train.evaluate import INFER_KEYS, evaluate_miou_temporal

        cfg, model, _, state = traj_setup
        steps = (0, 1, 3, 5)
        n = 3  # < 8 devices -> exercises the padded final batch

        def make_sample(i):
            s = synthetic_batch(cfg, 1, 128, seed=100 + i, with_traj=True)
            out = {k: v[0] for k, v in s.items()}
            for h, f in zip((0, 1, 2, 3), (0, 2, 4, 6)):
                out[f"gt_h{h}"] = (
                    s["temporal_semantics"][0, f - 1] if f > 0
                    else s["voxel_semantics"][0]
                )
            return out

        samples = [make_sample(i) for i in range(n)]

        # serial reference
        metric = MetricMIoUTemporal(num_classes=cfg.num_classes)
        for s in samples:
            infer = {
                k: jnp.asarray(v[None]) for k, v in s.items()
                if k in INFER_KEYS
            }
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                infer, train=False,
            )
            metric.add_batch(
                {h: np.asarray(out[f"semantic_occ_{k}s"][0])
                 for h, k in zip((0, 1, 2, 3), steps)},
                {h: s[f"gt_h{h}"] for h in (0, 1, 2, 3)},
            )
        serial = metric.count_miou()

        mesh = make_mesh(n_data=len(jax.devices()), n_seq=1)
        batched = evaluate_miou_temporal(
            model, state, iter(samples), mesh, rollout_steps=steps,
            num_classes=cfg.num_classes,
        )
        assert batched == serial, (batched, serial)
