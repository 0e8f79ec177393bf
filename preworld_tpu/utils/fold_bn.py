"""Inference-time conv+BN folding (`--fuse-conv-bn`).

Reference: `tools/test.py:48,220-221` calls mmcv's `fuse_conv_bn` before
eval. On TPU/XLA the inference BatchNorm is already a scale+shift the
compiler fuses into the conv epilogue, so this is CLI parity + parameter
canonicalization, not a throughput lever; the transform is still exact:

  every `Conv_0` + `BatchNorm_0` sibling pair (the ConvNormAct layout,
  models/layers.py) is rewritten as
     kernel' = kernel * gamma / sqrt(var + eps)       (per out-channel)
     BN      -> identity-with-bias: scale'=1, mean'=0, var'=1-eps,
                bias' = beta - mean * gamma / sqrt(var + eps)
  which computes the identical function (the module tree is fixed, so the
  BN stays as an affine no-op carrying the folded bias).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fold_conv_bn(params, batch_stats, eps: float = 1e-5):
    """Return (params', batch_stats') with every Conv_0+BatchNorm_0 pair
    folded. Inputs are plain nested dicts (flax unfrozen trees)."""

    def walk(p, s):
        if not isinstance(p, dict):
            return p, s
        p = dict(p)
        s = dict(s) if isinstance(s, dict) else {}
        if (
            "Conv_0" in p and "BatchNorm_0" in p
            and isinstance(s.get("BatchNorm_0"), dict)
            and "kernel" in p["Conv_0"]
        ):
            bn_p = dict(p["BatchNorm_0"])
            bn_s = dict(s["BatchNorm_0"])
            gamma = np.asarray(bn_p["scale"], np.float32)
            beta = np.asarray(bn_p["bias"], np.float32)
            mean = np.asarray(bn_s["mean"], np.float32)
            var = np.asarray(bn_s["var"], np.float32)
            scale = gamma / np.sqrt(var + eps)
            conv = dict(p["Conv_0"])
            kernel = np.asarray(conv["kernel"], np.float32)
            conv["kernel"] = jnp.asarray(
                kernel * scale, p["Conv_0"]["kernel"].dtype
            )
            # a biased conv folds its bias through the BN scale too:
            # scale*(k*x + b - mean) + beta == scale*k*x + (beta +
            # scale*(b - mean)); zero the conv bias and carry it in BN's
            folded_b = np.zeros_like(beta)
            if "bias" in conv:
                folded_b = scale * np.asarray(conv["bias"], np.float32)
                conv["bias"] = jnp.zeros_like(conv["bias"])
            bn_p["scale"] = jnp.ones_like(bn_p["scale"])
            bn_p["bias"] = jnp.asarray(
                beta - mean * scale + folded_b, bn_p["bias"].dtype
            )
            bn_s["mean"] = jnp.zeros_like(bn_s["mean"])
            bn_s["var"] = jnp.full_like(bn_s["var"], 1.0 - eps)
            p["Conv_0"], p["BatchNorm_0"], s["BatchNorm_0"] = conv, bn_p, bn_s
        for k in p:
            if isinstance(p[k], dict):
                p[k], sk = walk(p[k], s.get(k, {}))
                if sk:
                    s[k] = sk
        return p, s

    return walk(dict(params), dict(batch_stats))
