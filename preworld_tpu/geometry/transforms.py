"""Rigid-transform chains: sensor->key-ego, curr->adjacent-sensor, BEV aug.

Parity targets in the reference:
  * `prepare_inputs` sensor2keyego chain (`mmdet3d/models/detectors/bevdet_occ.py:88-139`)
  * stereo curr2adjsensor (`bevdet_occ.py:104-125`)
  * BEV-augmentation matrix (`mmdet3d/datasets/pipelines/loading.py:1143-1227`)

All functions are pure and work on numpy or jnp arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def invert_rigid(mat):
    """Invert a (..., 4, 4) rigid transform exactly (R^T, -R^T t)."""
    xp = jnp if isinstance(mat, jnp.ndarray) else np
    r = mat[..., :3, :3]
    t = mat[..., :3, 3:]
    r_inv = xp.swapaxes(r, -1, -2)
    t_inv = -r_inv @ t
    out = xp.zeros_like(mat)
    out = out.at[..., :3, :3].set(r_inv) if xp is jnp else _np_set(out, r_inv, t_inv)
    if xp is jnp:
        out = out.at[..., :3, 3:].set(t_inv)
        out = out.at[..., 3, 3].set(1.0)
    return out


def _np_set(out, r_inv, t_inv):
    out[..., :3, :3] = r_inv
    out[..., :3, 3:] = t_inv
    out[..., 3, 3] = 1.0
    return out


def sensor2keyego_chain(sensor2egos, ego2globals):
    """Transform each (frame, cam) sensor pose into the key frame's ego space.

    Key pose = frame 0, cam 0 (`bevdet_occ.py:99-104`):
        sensor2keyego = inv(ego2global[key]) @ ego2global @ sensor2ego

    Args:
      sensor2egos: (B, T, N, 4, 4)
      ego2globals: (B, T, N, 4, 4)
    Returns:
      (B, T, N, 4, 4) float32.
    """
    xp = jnp if isinstance(sensor2egos, jnp.ndarray) else np
    # f64 where available (numpy / x64-enabled jax); rigid inversion is exact
    # either way, so f32 on device stays well-conditioned.
    dt = xp.float64 if xp is np else sensor2egos.dtype
    keyego2global = ego2globals[:, 0:1, 0:1]
    global2keyego = invert_rigid(keyego2global.astype(dt))
    out = global2keyego @ ego2globals.astype(dt) @ sensor2egos.astype(dt)
    return out.astype(xp.float32)


def curr2adjsensor_chain(sensor2egos, ego2globals, temporal_frames: int):
    """Per temporal frame t: transform frame-t sensor coords into frame-(t+1)
    sensor coords (used to warp the previous stereo feature).

    Parity with `bevdet_occ.py:106-122`:
        curr2adj = inv(ego2global_adj @ sensor2ego_adj)
                   @ ego2global_curr @ sensor2ego_curr

    Args:
      sensor2egos: (B, T_total, N, 4, 4)  (T_total = temporal_frames + extra refs)
      ego2globals: (B, T_total, N, 4, 4)
      temporal_frames: number of frames with a next-frame stereo reference.
    Returns:
      (B, temporal_frames, N, 4, 4) float32.
    """
    xp = jnp if isinstance(sensor2egos, jnp.ndarray) else np
    dt = xp.float64 if xp is np else sensor2egos.dtype
    s2e = sensor2egos.astype(dt)
    e2g = ego2globals.astype(dt)
    curr_s2e = s2e[:, :temporal_frames]
    curr_e2g = e2g[:, :temporal_frames]
    adj_s2e = s2e[:, 1 : temporal_frames + 1]
    adj_e2g = e2g[:, 1 : temporal_frames + 1]
    out = invert_rigid(adj_e2g @ adj_s2e) @ curr_e2g @ curr_s2e
    return out.astype(xp.float32)


def bda_matrix(
    rotate_angle_deg: float = 0.0,
    scale_ratio: float = 1.0,
    flip_dx: bool = False,
    flip_dy: bool = False,
) -> np.ndarray:
    """BEV-augmentation 3x3 matrix.

    Parity with `bev_transform` (`loading.py:1174-1204`): rot about z, uniform
    3-axis scale, then x/y flips (composed as flip @ scale @ rot).
    """
    ang = np.deg2rad(rotate_angle_deg)
    rot = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    scale = np.eye(3, dtype=np.float32) * scale_ratio
    flip = np.eye(3, dtype=np.float32)
    if flip_dx:
        flip[0, 0] = -1.0
    if flip_dy:
        flip[1, 1] = -1.0
    return (flip @ scale @ rot).astype(np.float32)
