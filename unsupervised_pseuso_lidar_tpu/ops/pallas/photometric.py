"""Pallas TPU kernels for the fused photometric error.

The SSIM distance (/root/reference/losses.py:13-54) needs five 3x3
box-filtered moments (mu_x, mu_y, E[x^2], E[y^2], E[xy]); composed from
jnp ops, XLA materializes several intermediate maps between fusions. The
Pallas kernel computes the whole SSIM(+L1 blend) map with ONE HBM read of
each input image and ONE write of the output — every moment lives in VMEM
registers for the duration of the (batch, channel) grid cell.

Grid/block design: grid = (B, C) with (1, H, W, 1) blocks so the lane
dimension is the image width (multiples of 128 at KITTI-style sizes) and
channels never sit in the (tiny, padding-prone) minor dimension.
Reflection padding is expressed with in-VMEM concatenations.

Kernels fall back to `interpret=True` off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _box3x3_reflect_2d(x: jax.Array) -> jax.Array:
    """3x3 mean filter with reflect padding for a 2D map (VPU shifts)."""
    xp = jnp.concatenate([x[1:2, :], x, x[-2:-1, :]], axis=0)
    vert = (xp[:-2, :] + xp[1:-1, :] + xp[2:, :]) / 3.0
    hp = jnp.concatenate([vert[:, 1:2], vert, vert[:, -2:-1]], axis=1)
    return (hp[:, :-2] + hp[:, 1:-1] + hp[:, 2:]) / 3.0


def _photometric_kernel(x_ref, y_ref, out_ref, *, c1, c2, ssim_weight):
    x = x_ref[0, 0, :, :]
    y = y_ref[0, 0, :, :]

    mu_x = _box3x3_reflect_2d(x)
    mu_y = _box3x3_reflect_2d(y)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y

    sigma_x = _box3x3_reflect_2d(x * x) - mu_xx
    sigma_y = _box3x3_reflect_2d(y * y) - mu_yy
    sigma_xy = _box3x3_reflect_2d(x * y) - mu_xy

    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    ssim = jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)

    if ssim_weight >= 1.0:
        result = ssim
    else:
        result = ssim_weight * ssim + (1.0 - ssim_weight) * jnp.abs(y - x)
    out_ref[0, 0, :, :] = result


def _call(x, y, c1, c2, ssim_weight, interpret):
    batch, height, width, channels = x.shape
    # Mosaic requires the block's minor two dims to be the (sublane, lane)
    # pair: run the kernel channels-first so (H, W) are minor; XLA fuses
    # the surrounding transposes into neighbouring ops.
    xt = jnp.moveaxis(x, -1, 1)
    yt = jnp.moveaxis(y, -1, 1)
    kernel = functools.partial(
        _photometric_kernel, c1=c1, c2=c2, ssim_weight=ssim_weight
    )
    spec = pl.BlockSpec(
        (1, 1, height, width),
        lambda b, c: (b, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, channels),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(xt.shape, x.dtype),
        interpret=interpret,
    )(xt, yt)
    return jnp.moveaxis(out, 1, -1)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def ssim_distance_pallas(
    x: jax.Array,
    y: jax.Array,
    c1: float = 1e-4,
    c2: float = 9e-4,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused SSIM distance map — drop-in for ops.ssim.ssim_distance."""
    if interpret is None:
        interpret = not _on_tpu()
    return _call(x, y, c1, c2, ssim_weight=1.0, interpret=interpret)


def photometric_map_pallas(
    pred: jax.Array,
    target: jax.Array,
    ssim_weight: float = 0.85,
    c1: float = 1e-4,
    c2: float = 9e-4,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused 0.85*SSIM + 0.15*L1 per-pixel map (the compute_photometric_loss
    blend, /root/reference/losses.py:66-77, pre-clamp)."""
    if interpret is None:
        interpret = not _on_tpu()
    return _call(pred, target, c1, c2, ssim_weight=ssim_weight,
                 interpret=interpret)
