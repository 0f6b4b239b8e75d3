"""Monocular-depth evaluation metrics (training-extension counterpart of
parallel/train.py's SSI loss).

The reference ships no evaluation code — its only quantitative surface is the
informal fps table (SURVEY.md §6). Fine-tuning (tools/finetune_demo.py) needs
a validation story, so this module provides the standard monocular-depth
benchmark metrics (AbsRel / RMSE / RMSE-log / delta-thresholds, the MiDaS &
Depth-Anything evaluation protocol) with the same scale-shift-invariant
alignment convention the models are trained under: predictions are relative
inverse depth, so they are least-squares aligned (scale, shift) to the target
disparity per image before measuring — exactly the alignment inside
parallel/train.py:ssi_loss.

Everything is jnp, jittable, batched, and mask-aware; under a mesh the batch
axis shards over `data` like the train step (metrics are per-image means, so
the cross-device reduction is a plain mean).
"""

from __future__ import annotations

import jax.numpy as jnp


def align_scale_shift(pred_bhw, target_bhw, mask_bhw=None, eps: float = 1e-6):
    """Per-image least-squares (scale, shift) aligning pred to target —
    the SSI alignment of parallel/train.py:ssi_loss, returned explicitly.
    Returns aligned predictions with the same shape as the inputs."""
    b = pred_bhw.shape[0]
    p = pred_bhw.reshape(b, -1).astype(jnp.float32)
    t = target_bhw.reshape(b, -1).astype(jnp.float32)
    m = jnp.ones_like(p) if mask_bhw is None else mask_bhw.reshape(b, -1).astype(jnp.float32)

    n = jnp.sum(m, axis=1) + eps
    sp = jnp.sum(m * p, axis=1)
    st = jnp.sum(m * t, axis=1)
    spp = jnp.sum(m * p * p, axis=1)
    spt = jnp.sum(m * p * t, axis=1)
    det = n * spp - sp * sp + eps
    scale = (n * spt - sp * st) / det
    shift = (spp * st - sp * spt) / det
    return (scale[:, None] * p + shift[:, None]).reshape(pred_bhw.shape)


def depth_metrics(pred_bhw, target_bhw, mask_bhw=None, align: bool = True, eps: float = 1e-6):
    """Standard monocular-depth eval over a batch of inverse-depth maps.

    pred/target: (B, H, W) inverse depth (disparity-like, the models' output
    convention). mask: optional (B, H, W) validity weights. align=True first
    applies the per-image SSI (scale, shift) alignment — the protocol for
    relative-depth models; set False for metric models (DA-V2-metric), whose
    absolute scale is part of what is being evaluated.

    Returns a dict of scalar jnp values (batch means over valid pixels):
      abs_rel   mean |p - t| / t          (over pixels with t > eps)
      rmse      sqrt(mean (p - t)^2)
      rmse_log  sqrt(mean (log p - log t)^2)   (positive p and t only)
      delta1/2/3  fraction with max(p/t, t/p) < 1.25 / 1.25^2 / 1.25^3
    """
    b = pred_bhw.shape[0]
    if align:
        pred_bhw = align_scale_shift(pred_bhw, target_bhw, mask_bhw, eps)
    p = pred_bhw.reshape(b, -1).astype(jnp.float32)
    t = target_bhw.reshape(b, -1).astype(jnp.float32)
    m = jnp.ones_like(p) if mask_bhw is None else mask_bhw.reshape(b, -1).astype(jnp.float32)

    def masked_mean(x, w):
        return jnp.sum(w * x, axis=1) / (jnp.sum(w, axis=1) + eps)

    valid = m * (t > eps)
    # ratio metrics need positive predictions too (alignment can cross zero)
    both_pos = valid * (p > eps)
    pc = jnp.maximum(p, eps)

    abs_rel = masked_mean(jnp.abs(p - t) / jnp.maximum(t, eps), valid)
    rmse = jnp.sqrt(masked_mean((p - t) ** 2, m))
    rmse_log = jnp.sqrt(masked_mean((jnp.log(pc) - jnp.log(jnp.maximum(t, eps))) ** 2, both_pos))
    ratio = jnp.maximum(pc / jnp.maximum(t, eps), jnp.maximum(t, eps) / pc)
    out = {
        "abs_rel": jnp.mean(abs_rel),
        "rmse": jnp.mean(rmse),
        "rmse_log": jnp.mean(rmse_log),
    }
    for i, name in enumerate(("delta1", "delta2", "delta3")):
        out[name] = jnp.mean(masked_mean((ratio < 1.25 ** (i + 1)).astype(jnp.float32), both_pos))
    return out
