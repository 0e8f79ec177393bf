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
