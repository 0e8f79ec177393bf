"""Train state: optax AdamW + grad clip + MEGVII-style EMA.

Parity targets:
  * optimizer AdamW lr 1e-4 wd 1e-2, grad clip max-norm 5
    (`configs/preworld/nuscenes/bevstereo-occ.py:235-236`)
  * linear warmup 200 iters ratio 1e-3, step decay at epoch 100 (i.e. never
    within schedule) (`bevstereo-occ.py:237-242`)
  * MEGVIIEMAHook: decay 0.999 ramped by (1 - exp(-updates/2000))
    (`mmdet3d/core/hook/ema.py:31-116`, init_updates=10560)

Functional JAX re-design: the runner/hook machinery collapses into a pure
`train_step` (grad -> update -> EMA) suitable for jit/pjit; "DDP allreduce"
is implicit in SPMD sharding.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_updates: jnp.ndarray


def lr_schedule(
    base_lr: float = 1e-4,
    warmup_iters: int = 200,
    warmup_ratio: float = 1e-3,
    decay_steps: Tuple[int, ...] = (),
    decay_rate: float = 0.1,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def fn(step):
        warm = base_lr * (
            warmup_ratio + (1 - warmup_ratio) * jnp.minimum(step, warmup_iters)
            / warmup_iters
        )
        lr = warm
        for s in decay_steps:
            lr = jnp.where(step >= s, lr * decay_rate, lr)
        return lr

    return fn


def make_optimizer(
    base_lr: float = 1e-4,
    weight_decay: float = 1e-2,
    clip_norm: float = 5.0,
    warmup_iters: int = 200,
    decay_steps: Tuple[int, ...] = (),
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(
            lr_schedule(base_lr, warmup_iters, decay_steps=decay_steps),
            weight_decay=weight_decay,
        ),
    )


def ema_decay_schedule(updates: jnp.ndarray, decay: float = 0.999) -> jnp.ndarray:
    """MEGVII ramped momentum (`ema.py:63-71`): d = decay * (1 - e^{-u/2000})."""
    return decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))


def _fast_init_variables(model, batch, rng):
    """Shape-only init: eval_shape the real model.init, then fill leaves
    host-side (kernels: small deterministic normals; BN var/scale: ones;
    mean/bias: zeros). Skips the init forward's XLA compile (~40 s for the
    tiny dryrun model on 1 CPU core) — for compile checks and dryruns
    where weight VALUES don't matter, not for real training."""
    import numpy as np
    import zlib

    shapes = jax.eval_shape(
        lambda r: model.init(
            {"params": r, "dropout": jax.random.fold_in(r, 1)},
            batch,
            train=True,
        ),
        rng,
    )

    def fill(path, s):
        last = path[-1]
        name = getattr(last, "key", str(last))
        if name in ("var", "scale"):
            return jnp.ones(s.shape, s.dtype)
        if name in ("mean", "bias"):
            return jnp.zeros(s.shape, s.dtype)
        seed = zlib.adler32(jax.tree_util.keystr(path).encode())
        vals = np.random.default_rng(seed).normal(0.0, 0.02, s.shape)
        return jnp.asarray(vals.astype(np.float32)).astype(s.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def create_train_state(
    model,
    batch,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    init_ema_updates: int = 0,
    fast_init: bool = False,
) -> TrainState:
    if fast_init:
        variables = _fast_init_variables(model, batch, rng)
    else:
        @jax.jit
        def _init(rng):
            return model.init(
                {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                batch,
                train=True,
            )

        variables = _init(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=params,
        ema_updates=jnp.asarray(init_ema_updates, jnp.int32),
    )


def eval_params(state: TrainState):
    """Parameters to evaluate with: EMA once training has stepped, raw
    params otherwise. A fresh init (or a ported warm start that never
    trained) has `ema_params` equal to the init copy — evaluating it with a
    nonzero-looking `ema_updates` (init_updates ramps the decay, reference
    `ema.py:63-71`) would silently score near-init weights."""
    return state.ema_params if int(state.step) > 0 else state.params


def make_train_step(model, tx: optax.GradientTransformation,
                    ema_decay: float = 0.999, **apply_kwargs):
    """Pure (state, batch, rng) -> (state, metrics) suitable for jit/pjit.

    ema_decay: the MEGVII EMA momentum ceiling (config key `ema.decay`,
    reference `ema.py:31-41` resume value 0.999).
    apply_kwargs are forwarded statically to model.apply — e.g.
    `num_future=` for the forecasting rollout curriculum (a new step function
    per curriculum stage -> at most a handful of compiles per run).
    """

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
                **apply_kwargs,
            )
            total = sum(jax.tree_util.tree_leaves(out))
            return total, (out, mutated.get("batch_stats", state.batch_stats))

        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        d = ema_decay_schedule(state.ema_updates + 1, decay=ema_decay)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), state.ema_params, new_params
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
            ema_updates=state.ema_updates + 1,
        )
        metrics = dict(loss_dict)
        metrics["loss_total"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step
