"""Photometric appearance losses (L1, SSIM blend, outlier clamp).

Parity: /root/reference/losses.py:66-84 (compute_photometric_loss) — the
0.85·SSIM + 0.15·L1 blend with the mean + 0.5·std clamp — and the plain L1
used by the active training path (losses.py:223 via nn.L1Loss).

Note: the reference's SSIM member is commented out in Losses.__init__
(losses.py:59), so its SSIM path crashes if reached; here it works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unsupervised_pseuso_lidar_tpu.ops.ssim import ssim_distance_fused


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Scalar mean absolute error (torch nn.L1Loss default reduction)."""
    return jnp.mean(jnp.abs(pred - target))


def photometric_loss(
    pred: jax.Array,
    target: jax.Array,
    no_ssim: bool = False,
    ssim_weight: float = 0.85,
    clip_loss: float = 0.5,
) -> jax.Array:
    """Per-pixel photometric error map with optional SSIM blend + clamp.

    Returns the per-pixel map (reduction is the caller's job, matching the
    reference's structure).
    """
    l1 = jnp.abs(target - pred)
    if no_ssim:
        photometric = l1
    else:
        photometric = ssim_weight * ssim_distance_fused(pred, target) + (
            1.0 - ssim_weight
        ) * l1
    if clip_loss:
        # The threshold is DETACHED, like the reference's float() cast of
        # the tensor statistics (losses.py:83-84): clamped pixels must get
        # zero gradient, not route d(mean + k*std)/dx into every pixel.
        thresh = jax.lax.stop_gradient(
            jnp.mean(photometric) + clip_loss * jnp.std(photometric)
        )
        photometric = jnp.minimum(photometric, thresh)
    return photometric
