"""Voxel-loss parity tests vs torch-based oracles of the reference math."""

import jax.numpy as jnp
import numpy as np
import pytest

from preworld_tpu.losses import (
    ce_ssc_loss,
    distance_weighted_focal_loss,
    geo_scal_loss,
    lovasz_softmax_loss,
    sem_scal_loss,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def make_case(seed=0, B=1, X=6, Y=6, Z=4, C=18):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, X, Y, Z, C)).astype(np.float32)
    target = rng.integers(0, C, size=(B, X, Y, Z)).astype(np.int64)
    target[0, 0, 0, 0] = 255  # an ignore voxel
    return logits, target


class TestCE:
    def test_vs_torch(self):
        logits, target = make_case()
        w = np.linspace(0.5, 2.0, 18).astype(np.float32)
        ours = float(ce_ssc_loss(jnp.asarray(logits), jnp.asarray(target),
                                 jnp.asarray(w), 255))
        ref = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 4, 1, 2, 3),
            torch.from_numpy(target),
            weight=torch.from_numpy(w),
            ignore_index=255,
        )
        np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def torch_sem_scal(pred_torch, target_torch, ignore_index=255):
    """Line-for-line oracle of reference sem_scal_loss (`loss.py:32-80`)."""
    pred = F.softmax(pred_torch, dim=1)
    loss, count = 0, 0
    mask = target_torch != ignore_index
    n_classes = pred.shape[1]
    for i in range(n_classes):
        p = pred[:, i][mask]
        target = target_torch[mask]
        completion_target = (target == i).float()
        if completion_target.sum() > 0:
            count += 1
            nominator = (p * completion_target).sum()
            loss_class = 0
            if p.sum() > 0:
                precision = nominator / p.sum()
                loss_class += F.binary_cross_entropy(
                    precision, torch.ones_like(precision)
                )
            recall = nominator / completion_target.sum()
            loss_class += F.binary_cross_entropy(recall, torch.ones_like(recall))
            if (1 - completion_target).sum() > 0:
                spec = ((1 - p) * (1 - completion_target)).sum() / (
                    1 - completion_target
                ).sum()
                loss_class += F.binary_cross_entropy(spec, torch.ones_like(spec))
            loss += loss_class
    return loss / count


class TestScal:
    def test_sem_scal_vs_oracle(self):
        logits, target = make_case(1)
        ours = float(sem_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
        ref = torch_sem_scal(
            torch.from_numpy(logits).permute(0, 4, 1, 2, 3),
            torch.from_numpy(target),
        )
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4)

    def test_geo_scal_vs_oracle(self):
        logits, target = make_case(2)
        target = np.where(target == 255, 17, target)
        pred = F.softmax(torch.from_numpy(logits).permute(0, 4, 1, 2, 3), dim=1)
        empty = pred[:, 17]
        nonempty = 1 - empty
        mask = torch.from_numpy(target) != 17
        nonempty_t = mask.float()
        inter = (nonempty_t * nonempty).sum()
        precision = inter / nonempty.sum()
        recall = inter / nonempty_t.sum()
        spec = ((1 - nonempty_t) * empty).sum() / (1 - nonempty_t).sum()
        ref = (
            F.binary_cross_entropy(precision, torch.ones_like(precision))
            + F.binary_cross_entropy(recall, torch.ones_like(recall))
            + F.binary_cross_entropy(spec, torch.ones_like(spec))
        )
        ours = float(
            geo_scal_loss(jnp.asarray(logits), jnp.asarray(target),
                          non_empty_idx=17)
        )
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


def torch_lovasz(probas, labels, ignore=17):
    """Oracle of reference lovasz_softmax (classes='present', flat)."""

    def lovasz_grad(gt_sorted):
        p = len(gt_sorted)
        gts = gt_sorted.sum()
        intersection = gts - gt_sorted.float().cumsum(0)
        union = gts + (1 - gt_sorted).float().cumsum(0)
        jaccard = 1.0 - intersection / union
        if p > 1:
            jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
        return jaccard

    C = probas.shape[1]
    probas = probas.permute(0, 2, 3, 4, 1).reshape(-1, C)
    labels = labels.reshape(-1)
    valid = labels != ignore
    probas, labels = probas[valid], labels[valid]
    losses = []
    for c in range(C):
        fg = (labels == c).float()
        if fg.sum() == 0:
            continue
        errors = (fg - probas[:, c]).abs()
        errors_sorted, perm = torch.sort(errors, 0, descending=True)
        fg_sorted = fg[perm]
        losses.append(torch.dot(errors_sorted, lovasz_grad(fg_sorted)))
    return torch.stack(losses).mean()


class TestLovasz:
    def test_vs_oracle(self):
        logits, target = make_case(3)
        target = np.where(target == 255, 0, target)
        probs = F.softmax(torch.from_numpy(logits).permute(0, 4, 1, 2, 3), dim=1)
        ref = torch_lovasz(probs, torch.from_numpy(target), ignore=17)
        ours = float(
            lovasz_softmax_loss(jnp.asarray(logits), jnp.asarray(target),
                                ignore_index=17)
        )
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4, atol=1e-5)


class TestFocal:
    def test_vs_oracle(self):
        """Oracle: reference CustomFocalLoss py path (`focal_loss.py:12-60,
        233-258`): per-voxel sum over classes of focal * classweight * dist,
        mean over visible, x100."""
        logits, target = make_case(4, B=2, X=8, Y=8, Z=2)
        target = np.where(target == 255, 0, target)
        cls_w = np.concatenate(
            [np.linspace(0.5, 2, 17), [0.0]]
        ).astype(np.float32)

        B, X, Y, Z, C = logits.shape
        xs, ys = np.meshgrid(
            np.arange(X) - X / 2, np.arange(Y) - Y / 2, indexing="ij"
        )
        c = np.sqrt(xs**2 + ys**2)
        c = c / c.max() + 1
        pred = torch.from_numpy(logits.reshape(-1, C))
        tgt = torch.from_numpy(target.reshape(-1))
        dist = torch.from_numpy(
            np.broadcast_to(c[None, :, :, None], (B, X, Y, Z)).reshape(-1)
        ).float()
        onehot = F.one_hot(tgt, C + 1)[:, :C].float()
        ps = pred.sigmoid()
        pt = (1 - ps) * onehot + ps * (1 - onehot)
        focal_w = (0.25 * onehot + 0.75 * (1 - onehot)) * pt.pow(2)
        bce = F.binary_cross_entropy_with_logits(pred, onehot, reduction="none")
        weight = torch.from_numpy(cls_w)[None] * dist[:, None]
        ref = 100.0 * (bce * focal_w * weight).sum(-1).mean()

        ours = float(
            distance_weighted_focal_loss(
                jnp.asarray(logits), jnp.asarray(target), jnp.asarray(cls_w)
            )
        )
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4)
