"""Pinhole camera projection / backprojection, batched and NHWC.

Capability parity with the reference projective Transform
(/root/reference/geometry/transform.py:12-150), redesigned for TPU:

  * points live in channel-last [B, H, W, 3] layout (the reference is
    channel-first [B, 3, H, W]);
  * the reference's hardcoded batch size 4 (transform.py:110) and hardcoded
    .cuda() (transform.py:134) are removed — everything broadcasts and is
    device-agnostic;
  * the K^-1 @ grid and (K_hom @ T) @ X products are expressed as single
    einsums over all pixels so XLA maps them onto the MXU in one shot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel-coordinate grid [3, H, W] with rows (u, v, 1).

    u in [0, W-1] varies along axis 2, v in [0, H-1] along axis 1.
    Parity: /root/reference/geometry/transform.py:14-72 (meshgrid +
    image_grid, un-normalized variant) minus the per-batch repeat — the
    grid broadcasts over batch instead of being materialized B times.
    """
    u = jnp.arange(width, dtype=dtype)
    v = jnp.arange(height, dtype=dtype)
    uu = jnp.broadcast_to(u[None, :], (height, width))
    vv = jnp.broadcast_to(v[:, None], (height, width))
    ones = jnp.ones((height, width), dtype=dtype)
    return jnp.stack([uu, vv, ones], axis=0)


def backproject(depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Lift a depth map to per-pixel 3D points in the camera frame.

    X[b, h, w, :] = depth[b, h, w] * K[b]^-1 @ (u, v, 1).

    Args:
      depth: [B, H, W].
      intrinsics: [B, 3, 3] (or [3, 3], broadcast over batch).
    Returns:
      [B, H, W, 3] camera-frame points.

    Parity: /root/reference/geometry/transform.py:74-105 (reconstruct).
    """
    if intrinsics.ndim == 2:
        intrinsics = intrinsics[None]
    _, height, width = depth.shape
    grid = pixel_grid(height, width, dtype=depth.dtype)  # [3,H,W]
    k_inv = jnp.linalg.inv(intrinsics).astype(depth.dtype)  # [B,3,3]
    # rays[b, h, w, i] = sum_j Kinv[b, i, j] * grid[j, h, w]
    rays = jnp.einsum(
        "bij,jhw->bhwi", k_inv, grid, precision=jax.lax.Precision.HIGHEST
    )
    return rays * depth[..., None]


def project(
    points: jax.Array,
    intrinsics: jax.Array,
    transform: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Rigidly transform 3D points and project to normalized pixel coords.

    Returns coordinates in [-1, 1] (align_corners convention: -1 maps to
    pixel 0, +1 to pixel W-1/H-1) ready for bilinear resampling.

    Args:
      points: [B, H, W, 3] camera-frame points.
      intrinsics: [B, 3, 3] or [3, 3].
      transform: [B, 4, 4] rigid transform applied before projection.
      eps: perspective-divide regularizer.
    Returns:
      [B, H, W, 2] normalized (x, y) sampling coordinates.

    Parity: /root/reference/geometry/transform.py:114-150 (project),
    including the +1e-5 divide guard (transform.py:143) and the
    (p/(size-1) - 0.5) * 2 normalization (transform.py:146-148). The
    reference materializes a homogeneous K (k_hom, transform.py:107-112,
    with its batch-4 hardcode); here P = K @ T[:3] is formed directly.
    """
    if intrinsics.ndim == 2:
        intrinsics = intrinsics[None]
    _, height, width, _ = points.shape
    dtype = points.dtype
    # P = K @ T[:3, :] : [B, 3, 4]
    proj = jnp.einsum(
        "bij,bjk->bik",
        intrinsics.astype(dtype),
        transform[:, :3, :].astype(dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    cam = (
        jnp.einsum(
            "bik,bhwk->bhwi",
            proj[:, :, :3],
            points,
            precision=jax.lax.Precision.HIGHEST,
        )
        + proj[:, None, None, :, 3]
    )
    xy = cam[..., :2] / (cam[..., 2:3] + eps)
    scale = jnp.array([width - 1, height - 1], dtype=dtype)
    return (xy / scale - 0.5) * 2.0


def scale_intrinsics(
    intrinsics: jax.Array, scale_x: float, scale_y: float
) -> jax.Array:
    """Rescale K for a resized image (row 0 *= sx, row 1 *= sy).

    Parity: /root/reference/dataloaders.py:95-98."""
    scale = jnp.asarray(
        [[scale_x], [scale_y], [1.0]], dtype=intrinsics.dtype
    )
    return intrinsics * scale
