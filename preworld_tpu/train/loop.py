"""Epoch-based training loop: logging, checkpointing, eval.

Replaces the reference's mmcv EpochBasedRunner + hooks
(`mmdet3d/apis/train.py:180-319`): the lr schedule / grad clip / EMA live in
the optax chain + TrainState; this loop is thin glue around the jitted
`train_step` with host-side logging and orbax checkpoints.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Iterable, Optional

import jax

from .checkpoints import latest_step, restore_checkpoint, save_checkpoint

logger = logging.getLogger("preworld_tpu")


def train_epochs(
    state,
    train_step: Optional[Callable],
    loader,
    max_epochs: int,
    work_dir: str,
    shard_fn: Optional[Callable] = None,
    log_interval: int = 50,
    checkpoint_interval: int = 1,
    rng: Optional[jax.Array] = None,
    start_epoch: int = 0,
    eval_fn: Optional[Callable] = None,
    set_epoch_hooks: Iterable[Callable] = (),
    step_factory: Optional[Callable] = None,
    donate: bool = False,
    max_iters_per_epoch: Optional[int] = None,
    profile_dir: Optional[str] = None,
):
    """Run `max_epochs` epochs; returns the final state.

    set_epoch_hooks: callables(epoch) — e.g. rollout-curriculum control
    (reference `CustomSetEpochInfoHook`, `core/hook/set_epoch_info_hook.py`).
    step_factory: optional callable(epoch) -> train_step, for epoch-dependent
    step functions (forecasting rollout curriculum); caches identical steps.
    """
    os.makedirs(work_dir, exist_ok=True)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # NOTE: buffer donation combined with NamedSharding-placed inputs hits an
    # InvalidArgument in the axon TPU relay; default to no donation (costs a
    # transient params copy) until the backend supports it.
    dargs = (0,) if donate else ()
    if step_factory is None:
        step_jit = jax.jit(train_step, donate_argnums=dargs)
    metrics_log = open(os.path.join(work_dir, "metrics.jsonl"), "a")

    _step_cache = {}
    for epoch in range(start_epoch, max_epochs):
        if step_factory is not None:
            fn = step_factory(epoch)
            if id(fn) not in _step_cache:
                _step_cache[id(fn)] = jax.jit(fn, donate_argnums=dargs)
            step_jit = _step_cache[id(fn)]
        loader.set_epoch(epoch)
        for hook in set_epoch_hooks:
            hook(epoch)
        t_iter = time.time()
        for it, batch in enumerate(loader):
            if max_iters_per_epoch is not None and it >= max_iters_per_epoch:
                break
            if shard_fn is not None:
                batch = shard_fn(batch)
            rng, sub = jax.random.split(rng)
            # profile a few steady-state iterations (reference analog:
            # IterTimerHook + get_flops; here a full XLA device trace)
            if profile_dir and epoch == start_epoch and it == 8:
                try:
                    jax.profiler.start_trace(profile_dir)
                except Exception as e:  # backend may not support tracing
                    logger.warning("profiler unavailable: %s", e)
                    profile_dir = None
            if profile_dir and epoch == start_epoch and it == 12:
                try:
                    jax.profiler.stop_trace()
                    logger.info("profile written to %s", profile_dir)
                except Exception:
                    pass
            state, metrics = step_jit(state, batch, sub)
            if (it + 1) % log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = (time.time() - t_iter) / log_interval
                t_iter = time.time()
                rec = {
                    "epoch": epoch,
                    "iter": it + 1,
                    "time_per_iter": round(dt, 3),
                    **{k: round(v, 5) for k, v in metrics.items()},
                }
                logger.info(json.dumps(rec))
                metrics_log.write(json.dumps(rec) + "\n")
                metrics_log.flush()
        if (epoch + 1) % checkpoint_interval == 0:
            save_checkpoint(
                os.path.join(work_dir, "checkpoints"), state, int(state.step)
            )
        if eval_fn is not None:
            results = eval_fn(state)
            logger.info("eval@epoch%d: %s", epoch, results)
            metrics_log.write(
                json.dumps({"epoch": epoch, "eval": results}) + "\n"
            )
            metrics_log.flush()
    metrics_log.close()
    return state


def maybe_resume(state, work_dir: str, resume_from: Optional[str] = None):
    """Resume training state from a checkpoint. Returns (state, resumed).

    With `resume_from` set, honors the explicit path (reference
    `--resume-from`, `tools/train.py:148-156` + `utils/patch.py:56-99`) —
    accepts either a work_dir (containing `checkpoints/`) or a checkpoint
    directory itself; raises if nothing restorable is found there (an
    explicit path silently falling back would break the pretrain->finetune
    handoff). Otherwise auto-resumes from the latest checkpoint in
    `work_dir` (`--auto-resume`, `utils/patch.py:56-72`)."""
    if resume_from:
        for cand in (os.path.join(resume_from, "checkpoints"), resume_from):
            step = latest_step(cand)
            if step is not None:
                return restore_checkpoint(cand, state, step), True
        raise FileNotFoundError(
            f"--resume-from {resume_from}: no orbax checkpoint found "
            "(looked in ./checkpoints and the path itself)"
        )
    ckpt_dir = os.path.join(work_dir, "checkpoints")
    step = latest_step(ckpt_dir)
    if step is None:
        return state, False
    restored = restore_checkpoint(ckpt_dir, state, step)
    return restored, True
