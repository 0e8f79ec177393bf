"""Orbax checkpointing: save/restore TrainState + EMA, auto-resume.

Replaces the reference's mmcv CheckpointHook + `patch_checkpoint`/
`find_latest_checkpoint` (`mmdet3d/utils/patch.py:56-99`) and the separate
EMA checkpoints (`core/hook/ema.py:105-116`) — here EMA params live inside
the TrainState so a single checkpoint carries both.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(ckpt_dir: str, state, step: int, max_to_keep: int = 3):
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, state_template, step: Optional[int] = None):
    """Restore into the structure of `state_template` (same pytree/shapes)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(state_template)
    )
    mgr.close()
    return restored
