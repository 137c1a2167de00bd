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

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# Garg/Eigen evaluation crop, fractions of (H, W):
# rows [0.40810811, 0.99189189), cols [0.03594771, 0.96405229).
GARG_CROP = (0.40810811, 0.99189189, 0.03594771, 0.96405229)


def eigen_crop_mask(height: int, width: int) -> jnp.ndarray:
    """[H, W] boolean mask selecting the Garg crop used by the standard
    KITTI Eigen-split monocular depth protocol (crop away sky and image
    borders where LiDAR has no returns)."""
    top = int(GARG_CROP[0] * height)
    bottom = int(GARG_CROP[1] * height)
    left = int(GARG_CROP[2] * width)
    right = int(GARG_CROP[3] * width)
    rows = (jnp.arange(height) >= top) & (jnp.arange(height) < bottom)
    cols = (jnp.arange(width) >= left) & (jnp.arange(width) < right)
    return rows[:, None] & cols[None, :]


def _per_image_metrics(
    gt: jax.Array,
    pred: jax.Array,
    mask: jax.Array,
    min_depth: float,
    max_depth: float,
    median_scale: bool,
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Metrics for ONE [H, W] (flattened) image. Returns (metrics, n_valid)."""
    if median_scale:
        valid_gt = jnp.where(mask, gt, jnp.nan)
        valid_pred = jnp.where(mask, pred, jnp.nan)
        scale = jnp.nanmedian(valid_gt) / jnp.maximum(
            jnp.nanmedian(valid_pred), 1e-9
        )
        scale = jnp.where(jnp.isfinite(scale), scale, 1.0)
        pred = pred * scale
    pred = jnp.clip(pred, min_depth, max_depth)
    maskf = mask.astype(jnp.float32)
    n_valid = maskf.sum()
    n = jnp.maximum(n_valid, 1.0)
    safe_gt = jnp.where(mask, gt, 1.0)

    def masked_mean(x):
        return jnp.sum(x * maskf) / n

    thresh = jnp.maximum(safe_gt / pred, pred / safe_gt)
    d1 = masked_mean((thresh < 1.25).astype(jnp.float32))
    d2 = masked_mean((thresh < 1.25 ** 2).astype(jnp.float32))
    d3 = masked_mean((thresh < 1.25 ** 3).astype(jnp.float32))

    rms = jnp.sqrt(masked_mean((safe_gt - pred) ** 2))
    log_rms = jnp.sqrt(masked_mean((jnp.log(safe_gt) - jnp.log(pred)) ** 2))
    abs_rel = masked_mean(jnp.abs(safe_gt - pred) / safe_gt)
    sq_rel = masked_mean((safe_gt - pred) ** 2 / safe_gt)

    err = jnp.log(pred) - jnp.log(safe_gt)
    silog = jnp.sqrt(
        jnp.maximum(masked_mean(err ** 2) - masked_mean(err) ** 2, 0.0)
    ) * 100.0
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
    }, n_valid


def compute_errors(
    gt: jax.Array,
    pred: jax.Array,
    mask: Optional[jax.Array] = None,
    min_depth: float = 1e-3,
    max_depth: float = 80.0,
    median_scale: bool = False,
) -> Dict[str, jax.Array]:
    """Depth error metrics over valid ground-truth pixels.

    Protocol: metrics are computed PER IMAGE over its valid pixels and then
    averaged over images with at least one valid pixel — the standard
    Eigen/monodepth evaluation (each image weighs equally regardless of how
    many LiDAR returns it has). A 2-D input is treated as a single image.

    Args:
      gt: ground-truth depth, [H, W] or [B, H, W] (any trailing dims).
      pred: predicted depth, same shape.
      mask: optional boolean validity mask; defaults to
        (gt > min_depth) & (gt < max_depth) — sparse LiDAR GT convention
        plus the standard distance cap.
      min_depth/max_depth: predictions are clipped to this range before
        comparison (standard KITTI eval practice).
      median_scale: multiply pred by median(gt)/median(pred) over valid
        pixels (per image) before comparison — the standard monocular
        (Eigen/SfMLearner) protocol. Self-supervised depth trained with a
        LEARNED pose has a global scale ambiguity (the photometric loss is
        invariant to jointly scaling depth and translation), so unscaled
        metrics measure the arbitrary scale, not the structure. Leave
        False for scale-anchored training (semi_sup_pose).
    Returns:
      dict of scalar jnp metrics (jit-friendly: masked means, no boolean
      indexing).
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if mask is None:
        mask = (gt > min_depth) & (gt < max_depth)
    else:
        mask = mask & (gt > 0)

    if gt.ndim <= 2:
        metrics, _ = _per_image_metrics(
            gt.reshape(-1), pred.reshape(-1), mask.reshape(-1),
            min_depth, max_depth, median_scale,
        )
        return metrics

    batch = gt.shape[0]
    per_img = jax.vmap(
        lambda g, p, m: _per_image_metrics(
            g, p, m, min_depth, max_depth, median_scale
        )
    )(
        gt.reshape(batch, -1),
        pred.reshape(batch, -1),
        mask.reshape(batch, -1),
    )
    metrics_b, n_valid = per_img
    has_valid = (n_valid > 0).astype(jnp.float32)
    denom = jnp.maximum(has_valid.sum(), 1.0)
    return {
        k: jnp.sum(v * has_valid) / denom for k, v in metrics_b.items()
    }
