"""Velodyne scan <-> depth image projection (validation tooling).

Capability parity with /root/reference/pseudo-lidar/Transform/Transform.py:
69-148: project_velo_to_img rasterizes a LiDAR scan to a sparse depth image
(with the x > 0, dist <= 120 m, in-bounds filters) and project_img_to_velo
is the inverse pinhole backprojection.

TPU design: the reference loops Python-side over every point
(Transform.py:80-102, ~120k iterations per scan); here the rasterization is
one vectorized scatter — and where the reference keeps whichever point
lands last in the buffer, this keeps the NEAREST depth per pixel (scatter-
min, the physically correct z-buffer; documented deviation).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("width", "height", "max_dist"))
def project_velo_to_depth_image(
    points: jax.Array,
    velo_to_cam: jax.Array,
    proj: jax.Array,
    width: int,
    height: int,
    max_dist: float = 120.0,
) -> jax.Array:
    """Rasterize velodyne points into an [H, W] depth image.

    Args:
      points: [N, 3] or [N, 4] velodyne-frame points (reflectance dropped).
      velo_to_cam: [4, 4] rigid transform.
      proj: [3, 4] projection matrix.
      width/height: output image size.
      max_dist: range filter in meters.
    Returns:
      [H, W] float32 depth image; 0 where no point projects.
    """
    xyz = points[:, :3].astype(jnp.float32)
    dist = jnp.linalg.norm(xyz, axis=-1)
    ones = jnp.ones((xyz.shape[0], 1), dtype=xyz.dtype)
    hom = jnp.concatenate([xyz, ones], axis=-1)
    cam = jnp.einsum(
        "ij,nj->ni", velo_to_cam.astype(jnp.float32), hom,
        precision=jax.lax.Precision.HIGHEST,
    )
    uvw = jnp.einsum(
        "ij,nj->ni", proj.astype(jnp.float32), cam,
        precision=jax.lax.Precision.HIGHEST,
    )
    u = uvw[:, 0] / uvw[:, 2]
    v = uvw[:, 1] / uvw[:, 2]
    depth = cam[:, 2]

    valid = (
        (u >= 0)
        & (u < width)
        & (v >= 0)
        & (v < height)
        & (dist <= max_dist)
        & (xyz[:, 0] > 0)
    )
    ui = jnp.clip(u.astype(jnp.int32), 0, width - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, height - 1)
    flat_idx = vi * width + ui

    big = jnp.float32(1e9)
    values = jnp.where(valid, depth, big)
    buffer = jnp.full((height * width,), big, dtype=jnp.float32)
    buffer = buffer.at[flat_idx].min(values)
    image = jnp.where(buffer >= big, 0.0, buffer)
    return image.reshape(height, width)


def project_img_to_velo(
    depth_img: np.ndarray, velo_to_cam: np.ndarray, proj: np.ndarray
) -> np.ndarray:
    """Inverse: depth image -> velodyne cloud (host API; the on-device
    batched version is pseudolidar.projector.depth_to_pointcloud).

    Parity: /root/reference/pseudo-lidar/Transform/Transform.py:111-148.
    """
    from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
        depth_to_pointcloud,
    )

    points, valid = depth_to_pointcloud(
        jnp.asarray(depth_img, dtype=jnp.float32)[None],
        jnp.asarray(proj, dtype=jnp.float32),
        jnp.asarray(velo_to_cam, dtype=jnp.float32),
    )
    return np.asarray(points[0])[np.asarray(valid[0])]
