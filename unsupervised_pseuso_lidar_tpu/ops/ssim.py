"""SSIM structural-similarity distance (NHWC, VPU-friendly).

Parity: /root/reference/losses.py:13-54 (SSIM.standard_loss): 3x3 average
pooling at stride 1 over reflection-padded inputs, C1=1e-4, C2=9e-4, and
the final clamp((1 - ssim) / 2, 0, 1).

TPU design: the five pooled moments are computed with a single fused
reduce-window pattern (separable 3x3 box filter as two 1D averages) —
pure elementwise + shift work that XLA keeps entirely in registers/VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box3x3_reflect(x: jax.Array) -> jax.Array:
    """3x3 mean filter with reflection padding, output same H, W.

    Separable: row average then column average of the reflect-padded map.
    Padding is slice+concat (same-dtype data movement) — jnp.pad's reflect
    mode expands into activation-sized s32 iota/select chains under XLA
    (see ops/resample.reflect_pad1).
    """
    from unsupervised_pseuso_lidar_tpu.ops.resample import reflect_pad1

    pad = reflect_pad1(x)
    horiz = (pad[:, :, :-2, :] + pad[:, :, 1:-1, :] + pad[:, :, 2:, :]) / 3.0
    return (horiz[:, :-2, :, :] + horiz[:, 1:-1, :, :] + horiz[:, 2:, :, :]) / 3.0


def ssim_distance(
    x: jax.Array,
    y: jax.Array,
    c1: float = 1e-4,
    c2: float = 9e-4,
) -> jax.Array:
    """Per-pixel SSIM distance in [0, 1] between two NHWC images.

    Returns clamp((1 - SSIM(x, y)) / 2, 0, 1) with the same constants and
    3x3 reflect-padded average pooling as the reference.
    """
    mu_x = _box3x3_reflect(x)
    mu_y = _box3x3_reflect(y)
    mu_xy = mu_x * mu_y
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y

    sigma_x = _box3x3_reflect(x * x) - mu_xx
    sigma_y = _box3x3_reflect(y * y) - mu_yy
    sigma_xy = _box3x3_reflect(x * y) - mu_xy

    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    ssim = num / den
    return jnp.clip((1.0 - ssim) / 2.0, 0.0, 1.0)


def _fits_vmem(shape) -> bool:
    # whole-image blocks must fit VMEM alongside ~10 moment buffers
    height, width = shape[1], shape[2]
    return height * width * 4 * 12 < 12 * 1024 * 1024


@jax.custom_vjp
def ssim_distance_fused(x: jax.Array, y: jax.Array) -> jax.Array:
    """SSIM distance with a fused Pallas TPU forward kernel.

    Forward runs the single-HBM-pass kernel (ops/pallas/photometric.py)
    when on TPU, fp32, and the image fits VMEM; the backward pass is the
    XLA vjp of the jnp implementation (identical math), so the op is safe
    inside jax.grad."""
    return _ssim_forward_impl(x, y)


def _ssim_forward_impl(x, y):
    if (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.float32
        and _fits_vmem(x.shape)
    ):
        from unsupervised_pseuso_lidar_tpu.ops.pallas.photometric import (
            ssim_distance_pallas,
        )

        return ssim_distance_pallas(x, y)
    return ssim_distance(x, y)


def _ssim_fwd(x, y):
    return _ssim_forward_impl(x, y), (x, y)


def _ssim_bwd(residuals, g):
    x, y = residuals
    if (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.float32
        and _fits_vmem(x.shape)
        and x.shape[1] >= 2
        and x.shape[2] >= 2
    ):
        # fused one-pass backward: the XLA vjp of the jnp forward spends
        # ~10 activation-sized HBM round trips recomputing the five
        # box-filtered moments and running their adjoints as separate
        # fusions; the Pallas kernel reads (x, y, g) once and writes
        # (dx, dy) once (ops/pallas/photometric.ssim_bwd_pallas)
        from unsupervised_pseuso_lidar_tpu.ops.pallas.photometric import (
            ssim_bwd_pallas,
        )

        return ssim_bwd_pallas(x, y, g)
    _, vjp = jax.vjp(ssim_distance, x, y)
    return vjp(g)


ssim_distance_fused.defvjp(_ssim_fwd, _ssim_bwd)
