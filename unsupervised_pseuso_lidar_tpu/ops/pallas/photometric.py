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


# ---------------------------------------------------------------------------
# Fused SSIM backward
# ---------------------------------------------------------------------------
#
# The XLA vjp of the jnp SSIM recomputes the five box-filtered moments AND
# runs five box-filter adjoints as separate activation-sized fusion passes
# (~10 HBM round trips of the image volume per call). This kernel computes
# the exact cotangents (dx, dy) in ONE pass: read x, y, g; every moment,
# partial, and adjoint filter lives in VMEM for the (batch, channel) grid
# cell; write dx, dy.


def _box1d_adjoint(g: jax.Array, axis: int) -> jax.Array:
    """Adjoint of the reflect-padded length-3 mean filter along `axis`.

    Forward (per axis of length L): xp = concat(x[1:2], x, x[L-2:L-1]);
    out[i] = (xp[i] + xp[i+1] + xp[i+2]) / 3. The adjoint is the ZERO-padded
    box of the cotangent plus the two reflect folds: rows 0 / L-1 of g fold
    into rows 1 / L-2 of the result (the pad rows were copies of interior
    rows, so their cotangent accumulates there).
    """
    if axis == 1:
        zero = jnp.zeros_like(g[:, 0:1])
        gp = jnp.concatenate([zero, g, zero], axis=1)
        out = (gp[:, :-2] + gp[:, 1:-1] + gp[:, 2:]) / 3.0
        fold_lo = jnp.concatenate(
            [zero, g[:, 0:1], jnp.zeros_like(g[:, 2:])], axis=1
        )
        fold_hi = jnp.concatenate(
            [jnp.zeros_like(g[:, :-2]), g[:, -1:], zero], axis=1
        )
        return out + (fold_lo + fold_hi) / 3.0
    zero = jnp.zeros_like(g[0:1, :])
    gp = jnp.concatenate([zero, g, zero], axis=0)
    out = (gp[:-2, :] + gp[1:-1, :] + gp[2:, :]) / 3.0
    fold_top = jnp.concatenate(
        [zero, g[0:1, :], jnp.zeros_like(g[2:, :])], axis=0
    )
    fold_bot = jnp.concatenate(
        [jnp.zeros_like(g[:-2, :]), g[-1:, :], zero], axis=0
    )
    return out + (fold_top + fold_bot) / 3.0


def _box3x3_reflect_adjoint_2d(g: jax.Array) -> jax.Array:
    # forward = horizontal after vertical; adjoint composes in reverse
    return _box1d_adjoint(_box1d_adjoint(g, 1), 0)


def _ssim_bwd_kernel(x_ref, y_ref, g_ref, dx_ref, dy_ref, *, c1, c2):
    x = x_ref[0, 0, :, :]
    y = y_ref[0, 0, :, :]
    g = g_ref[0, 0, :, :]

    m1 = _box3x3_reflect_2d(x)
    m2 = _box3x3_reflect_2d(y)
    p1 = _box3x3_reflect_2d(x * x)
    p2 = _box3x3_reflect_2d(y * y)
    p3 = _box3x3_reflect_2d(x * y)

    mu_xy = m1 * m2
    a = 2.0 * mu_xy + c1
    b = 2.0 * (p3 - mu_xy) + c2
    c = m1 * m1 + m2 * m2 + c1
    d = p1 + p2 - m1 * m1 - m2 * m2 + c2
    s = (a * b) / (c * d)
    raw = (1.0 - s) / 2.0
    # clip(raw, 0, 1) gradient: pass inside the open interval (the exact
    # tie raw == 0 — bit-identical patches — gets 0 here where the jnp
    # autodiff would split the max-tie; identical inputs carry no useful
    # photometric gradient either way)
    mask = jnp.logical_and(raw > 0.0, raw < 1.0)
    g_s = jnp.where(mask, g, 0.0) * (-0.5)

    inv_cd = 1.0 / (c * d)
    g_a = g_s * b * inv_cd
    g_b = g_s * a * inv_cd
    g_c = -g_s * s / c
    g_d = -g_s * s / d

    g_ab = g_a - g_b
    g_cd = g_c - g_d
    g_m1 = 2.0 * (m2 * g_ab + m1 * g_cd)
    g_m2 = 2.0 * (m1 * g_ab + m2 * g_cd)
    # g_p1 = g_p2 = g_d; g_p3 = 2*g_b
    t_m1 = _box3x3_reflect_adjoint_2d(g_m1)
    t_m2 = _box3x3_reflect_adjoint_2d(g_m2)
    t_pd = _box3x3_reflect_adjoint_2d(g_d)
    t_p3 = _box3x3_reflect_adjoint_2d(2.0 * g_b)

    dx_ref[0, 0, :, :] = t_m1 + 2.0 * x * t_pd + y * t_p3
    dy_ref[0, 0, :, :] = t_m2 + 2.0 * y * t_pd + x * t_p3


def ssim_bwd_pallas(
    x: jax.Array,
    y: jax.Array,
    g: jax.Array,
    c1: float = 1e-4,
    c2: float = 9e-4,
    interpret: bool | None = None,
):
    """Exact (dx, dy) cotangents of ssim_distance in one fused pass."""
    if interpret is None:
        interpret = not _on_tpu()
    batch, height, width, channels = x.shape
    xt = jnp.moveaxis(x, -1, 1)
    yt = jnp.moveaxis(y, -1, 1)
    gt = jnp.moveaxis(g, -1, 1)
    kernel = functools.partial(_ssim_bwd_kernel, c1=c1, c2=c2)
    spec = pl.BlockSpec(
        (1, 1, height, width),
        lambda b, c: (b, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dx, dy = pl.pallas_call(
        kernel,
        grid=(batch, channels),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(xt.shape, x.dtype),
            jax.ShapeDtypeStruct(xt.shape, x.dtype),
        ],
        interpret=interpret,
    )(xt, yt, gt)
    return jnp.moveaxis(dx, 1, -1), jnp.moveaxis(dy, 1, -1)
