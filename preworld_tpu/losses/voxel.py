"""3-D occupancy losses: CE, semantic/geometric scal, Lovasz, focal.

Parity targets:
  * CE_ssc_loss / sem_scal_loss / geo_scal_loss
    (`mmdet3d/models/detectors/loss.py:20-113`, MonoScene style)
  * lovasz_softmax (`mmdet3d/models/detectors/lovasz_softmax.py`,
    classes='present', per_image=False, ignore=empty)
  * CustomFocalLoss distance-weighted sigmoid focal
    (`mmdet3d/models/loss_utils/focal_loss.py:160-266`)

All implemented with static shapes: ignored voxels get zero weight instead
of boolean compaction. Logits are channel-LAST: (B, X, Y, Z, C);
targets (B, X, Y, Z) int.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _valid_mask(target, ignore_index, camera_mask):
    m = (target != ignore_index).astype(jnp.float32)
    if camera_mask is not None:
        m = m * camera_mask.astype(jnp.float32)
    return m


def ce_ssc_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: jnp.ndarray,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Weighted CE, torch semantics: sum(w_t * ce) / sum(w_t) over valid."""
    C = logits.shape[-1]
    m = (target != ignore_index).astype(jnp.float32)
    t = jnp.clip(target, 0, C - 1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    w = class_weights[t] * m
    return (ce * w).sum() / jnp.maximum(w.sum(), 1e-8)


def _bce_of_ratio(r):
    """F.binary_cross_entropy(r, 1) == -log(r) (clamped as torch does)."""
    return -jnp.log(jnp.clip(r, 1e-12, 1.0))


def sem_scal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int = 255,
    camera_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Class-wise precision/recall/specificity BCE (`loss.py:32-80`)."""
    C = logits.shape[-1]
    p = jax.nn.softmax(logits, axis=-1)
    m = _valid_mask(target, ignore_index, camera_mask)
    loss = 0.0
    count = 0.0
    for c in range(C):
        pc = p[..., c] * m
        fg = ((target == c).astype(jnp.float32)) * m
        n_fg = fg.sum()
        present = (n_fg > 0).astype(jnp.float32)
        nominator = (pc * fg).sum()
        sum_p = pc.sum()
        n_bg = (m * (1.0 - (target == c).astype(jnp.float32))).sum()
        precision = nominator / jnp.maximum(sum_p, 1e-12)
        recall = nominator / jnp.maximum(n_fg, 1e-12)
        spec = ((1.0 - pc) * (1.0 - (target == c)) * m).sum() / jnp.maximum(
            n_bg, 1e-12
        )
        loss_c = (
            jnp.where(sum_p > 0, _bce_of_ratio(precision), 0.0)
            + _bce_of_ratio(recall)
            + jnp.where(n_bg > 0, _bce_of_ratio(spec), 0.0)
        )
        loss = loss + present * loss_c
        count = count + present
    return loss / jnp.maximum(count, 1.0)


def geo_scal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int = 255,
    non_empty_idx: int = 17,
    camera_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Geometric (occupied vs free) precision/recall/specificity BCE
    (`loss.py:83-113`). Note the reference masks only by `target != empty`
    (+ camera mask); 255-ignore voxels are NOT excluded there — we mirror it.
    """
    p = jax.nn.softmax(logits, axis=-1)
    empty_probs = p[..., non_empty_idx]
    nonempty_probs = 1.0 - empty_probs
    mask = (target != non_empty_idx).astype(jnp.float32)
    if camera_mask is not None:
        mask = mask * camera_mask.astype(jnp.float32)
    nonempty_target = mask
    intersection = (nonempty_target * nonempty_probs).sum()
    precision = intersection / jnp.maximum(nonempty_probs.sum(), 1e-12)
    recall = intersection / jnp.maximum(nonempty_target.sum(), 1e-12)
    spec = ((1.0 - nonempty_target) * empty_probs).sum() / jnp.maximum(
        (1.0 - nonempty_target).sum(), 1e-12
    )
    return _bce_of_ratio(precision) + _bce_of_ratio(recall) + _bce_of_ratio(spec)


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors
    (`lovasz_softmax.py:22-34`)."""
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int = 17,
    camera_mask: Optional[jnp.ndarray] = None,
    from_probs: bool = False,
) -> jnp.ndarray:
    """Multi-class Lovasz-softmax, classes='present', per_image=False.

    Static-shape version of `lovasz_softmax.py:157-205`: ignored voxels get
    zero error and fg=0 and are sorted to the tail (errors are >= 0), so they
    contribute nothing to the Lovasz extension.
    """
    C = logits.shape[-1]
    probs = logits if from_probs else jax.nn.softmax(logits, axis=-1)
    probs = probs.reshape(-1, C)
    t = target.reshape(-1)
    valid = t != ignore_index
    if camera_mask is not None:
        valid = valid & camera_mask.reshape(-1).astype(bool)
    vf = valid.astype(jnp.float32)

    def class_loss(c):
        fg = (t == c).astype(jnp.float32) * vf
        err = jnp.abs(fg - probs[:, c]) * vf  # ignored -> 0 error
        order = jnp.argsort(-err)
        err_s = err[order]
        fg_s = fg[order]
        grad = _lovasz_grad(fg_s)
        present = (fg.sum() > 0).astype(jnp.float32)
        return present * jnp.dot(err_s, grad), present

    losses, presents = jax.vmap(class_loss)(jnp.arange(C))
    return losses.sum() / jnp.maximum(presents.sum(), 1.0)


def distance_weighted_focal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: jnp.ndarray,
    ignore_index: int = 255,
    camera_mask: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    loss_weight: float = 100.0,
) -> jnp.ndarray:
    """CustomFocalLoss: sigmoid focal CE over visible voxels, weighted by
    class weight x BEV-distance factor (1 + r/r_max)
    (`focal_loss.py:195-266`): loss = lw * mean_vis(sum_c focal_c * w_c * d).

    logits: (B, X, Y, Z, C); target: (B, X, Y, Z).
    """
    B, X, Y, Z, C = logits.shape
    xs = jnp.arange(X, dtype=jnp.float32) - X / 2
    ys = jnp.arange(Y, dtype=jnp.float32) - Y / 2
    r = jnp.sqrt(xs[:, None] ** 2 + ys[None, :] ** 2)
    dist = r / r.max() + 1.0  # (X, Y) in [1, 2]
    dist = jnp.broadcast_to(dist[None, :, :, None], (B, X, Y, Z))

    m = _valid_mask(target, ignore_index, camera_mask)
    t = jnp.clip(target, 0, C).astype(jnp.int32)
    onehot = jax.nn.one_hot(t, C + 1, dtype=jnp.float32)[..., :C]
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * onehot + p * (1.0 - onehot)
    focal_w = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt**gamma
    bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    per_elem = bce * focal_w * class_weights[None, None, None, None, :]
    per_vox = per_elem.sum(-1) * dist * m
    return loss_weight * per_vox.sum() / jnp.maximum(m.sum(), 1.0)
