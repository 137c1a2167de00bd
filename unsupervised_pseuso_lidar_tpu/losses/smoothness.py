"""Second-order smoothness regularizer over predicted depth maps.

Parity: /root/reference/losses.py:242-260 (smooth_loss): second-order
finite differences (dx2, dxdy, dydx, dy2), absolute means summed, with a
per-scale weight decaying by 1/2.3.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _gradients(pred: jax.Array):
    """(d/dx, d/dy) finite differences for [B, H, W, C] maps."""
    dy = pred[:, 1:, :, :] - pred[:, :-1, :, :]
    dx = pred[:, :, 1:, :] - pred[:, :, :-1, :]
    return dx, dy


def smooth_loss(
    pred_maps: Sequence[jax.Array] | jax.Array, decay: float = 2.3
) -> jax.Array:
    """Sum over scales of weighted second-order gradient penalties.

    Args:
      pred_maps: one [B, H, W, C] map or a list of them (finest first);
        the per-scale weight is 1, 1/decay, 1/decay^2, ...
    """
    if not isinstance(pred_maps, (tuple, list)):
        pred_maps = [pred_maps]
    loss = jnp.asarray(0.0, dtype=jnp.result_type(pred_maps[0]))
    weight = 1.0
    for scaled_map in pred_maps:
        dx, dy = _gradients(scaled_map)
        dx2, dxdy = _gradients(dx)
        dydx, dy2 = _gradients(dy)
        loss = loss + weight * (
            jnp.mean(jnp.abs(dx2))
            + jnp.mean(jnp.abs(dxdy))
            + jnp.mean(jnp.abs(dydx))
            + jnp.mean(jnp.abs(dy2))
        )
        weight /= decay
    return loss
