"""KITTI depth evaluation metrics.

Parity: /root/reference/evaluate.py:6-39 (compute_errors): silog, abs_rel,
log10, rms, sq_rel, log_rms, and the delta thresholds d1/d2/d3.

Reference-bug policy (documented): the reference assigns `rms` to the
"sq_rel" key (evaluate.py:36) — fixed here, sq_rel is the actual squared
relative error. The reference also hardcodes disp_to_depth on the
prediction (evaluate.py:11) in a way that only works for a single-scale
toy shape (why its validation loop is disabled); here the caller converts
disparity to depth and passes depth directly, with masking support for
sparse KITTI ground truth (reference GT is sparse LiDAR depth where 0 =
no measurement).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def compute_errors(
    gt: jax.Array,
    pred: jax.Array,
    mask: Optional[jax.Array] = None,
    min_depth: float = 1e-3,
    max_depth: float = 80.0,
    median_scale: bool = False,
) -> Dict[str, jax.Array]:
    """Depth error metrics over valid ground-truth pixels.

    Args:
      gt: ground-truth depth, any shape.
      pred: predicted depth, same shape.
      mask: optional boolean validity mask; defaults to gt > 0 (sparse
        LiDAR GT convention).
      min_depth/max_depth: predictions are clipped to this range before
        comparison (standard KITTI eval practice).
      median_scale: multiply pred by median(gt)/median(pred) over valid
        pixels before comparison — the standard monocular (Eigen/
        SfMLearner) protocol. Self-supervised depth trained with a
        LEARNED pose has a global scale ambiguity (the photometric loss
        is invariant to jointly scaling depth and translation), so
        unscaled metrics measure the arbitrary scale, not the structure.
        Per protocol the ratio is computed PER IMAGE (axis 0 when the
        input is batched [B, H, W]); images with no valid pixels keep
        scale 1 (their pixels are masked out of the means anyway).
        Leave False for scale-anchored training (semi_sup_pose).
    Returns:
      dict of scalar jnp metrics (jit-friendly: masked means, no boolean
      indexing).
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if mask is None:
        mask = gt > 0
    if median_scale:
        valid_gt = jnp.where(mask, gt, jnp.nan)
        valid_pred = jnp.where(mask, pred, jnp.nan)
        if gt.ndim >= 3:  # batched: one ratio per image (Eigen protocol)
            med_axes = tuple(range(1, gt.ndim))
            expand = (...,) + (None,) * (gt.ndim - 1)
            med_gt = jnp.nanmedian(valid_gt, axis=med_axes)[expand]
            med_pred = jnp.nanmedian(valid_pred, axis=med_axes)[expand]
        else:
            med_gt = jnp.nanmedian(valid_gt)
            med_pred = jnp.nanmedian(valid_pred)
        scale = med_gt / jnp.maximum(med_pred, 1e-9)
        scale = jnp.where(jnp.isfinite(scale), scale, 1.0)
        pred = pred * scale
    pred = jnp.clip(pred, min_depth, max_depth)
    mask = mask.astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    safe_gt = jnp.where(mask > 0, gt, 1.0)

    def masked_mean(x):
        return jnp.sum(x * mask) / n

    thresh = jnp.maximum(safe_gt / pred, pred / safe_gt)
    d1 = masked_mean((thresh < 1.25).astype(jnp.float32))
    d2 = masked_mean((thresh < 1.25 ** 2).astype(jnp.float32))
    d3 = masked_mean((thresh < 1.25 ** 3).astype(jnp.float32))

    rms = jnp.sqrt(masked_mean((safe_gt - pred) ** 2))
    log_rms = jnp.sqrt(masked_mean((jnp.log(safe_gt) - jnp.log(pred)) ** 2))
    abs_rel = masked_mean(jnp.abs(safe_gt - pred) / safe_gt)
    sq_rel = masked_mean((safe_gt - pred) ** 2 / safe_gt)

    err = jnp.log(pred) - jnp.log(safe_gt)
    silog = jnp.sqrt(masked_mean(err ** 2) - masked_mean(err) ** 2) * 100.0
    log10 = masked_mean(jnp.abs(jnp.log10(pred) - jnp.log10(safe_gt)))

    return {
        "silog": silog,
        "abs_rel": abs_rel,
        "log10": log10,
        "rms": rms,
        "sq_rel": sq_rel,
        "log_rms": log_rms,
        "d1": d1,
        "d2": d2,
        "d3": d3,
    }
