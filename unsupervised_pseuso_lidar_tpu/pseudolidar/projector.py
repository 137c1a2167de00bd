"""Pseudo-LiDAR generation: depth maps -> 3D point clouds (batched, jitted).

Capability parity with /root/reference/pseudo-lidar/utils/PseudoLiDAR.py:5-109
(project_PL): pinhole backprojection through P_rect_02 (including the
baseline terms b_x, b_y), inverse rigid transform into the Velodyne frame,
the pseudo-LiDAR height crop (x >= 0 and z < 1 m, per the pseudo-LiDAR
paper), and stride-based sparsification.

TPU design: the reference filters with boolean indexing (dynamic output
shape, PseudoLiDAR.py:104-109); XLA requires static shapes, so the batched
on-device op returns (points [B, H*W, 4], valid [B, H*W]) with the crop and
sparsity folded into the mask. A host-side .project() compacts to the
reference's [N, 4] when numpy output is wanted.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_pseuso_lidar_tpu.geometry.calibration import Calibration


@partial(jax.jit, static_argnames=("sparsity", "max_high"))
def depth_to_pointcloud(
    depth: jax.Array,
    proj: jax.Array,
    velo_to_cam: jax.Array,
    sparsity: int = 0,
    max_high: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Backproject depth images into Velodyne-frame point clouds.

    Args:
      depth: [B, H, W] (or [H, W]) depth in meters (rectified cam 2 frame).
      proj: [3, 4] P_rect_02 projection matrix.
      velo_to_cam: [4, 4] rigid velodyne->camera transform.
      sparsity: keep every k-th valid point (0 = keep all), matching the
        reference's cloud[0::sparsity] (PseudoLiDAR.py:107-109).
      max_high: height crop in meters (z_velo < max_high).
    Returns:
      points: [B, H*W, 4] homogeneous Velodyne-frame points.
      valid:  [B, H*W] boolean mask (FOV/height crop + sparsity).
    """
    if depth.ndim == 2:
        depth = depth[None]
    batch, height, width = depth.shape
    dtype = depth.dtype

    c_u = proj[0, 2]
    c_v = proj[1, 2]
    f_u = proj[0, 0]
    f_v = proj[1, 1]
    b_x = proj[0, 3] / (-f_u)
    b_y = proj[1, 3] / (-f_v)

    u = jnp.arange(width, dtype=dtype)[None, None, :]
    v = jnp.arange(height, dtype=dtype)[None, :, None]
    x = (u - c_u) * depth / f_u + b_x
    y = (v - c_v) * depth / f_v + b_y
    ones = jnp.ones_like(depth)
    cam_points = jnp.stack([x, y, depth, ones], axis=-1).reshape(batch, -1, 4)

    # camera -> velodyne: rows of [R.T | -R.T t]
    cam_to_velo = jnp.linalg.inv(velo_to_cam).astype(dtype)
    velo = jnp.einsum(
        "ij,bnj->bni", cam_to_velo, cam_points,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Intensity placeholder in column 3 (the reference's zero-padded inverse
    # transform leaves it 0, PseudoLiDAR.py:43-46,100 — clouds are (x,y,z,0)).
    velo = velo.at[..., 3].set(0.0)

    # depth > 0 excludes no-return pixels (rasterized LiDAR depth images
    # are ~90% zeros; a zero-depth pixel backprojects to the camera origin,
    # which passes the x>=0 / height crop and would flood the cloud with
    # phantom points at the sensor)
    valid = (
        (velo[..., 0] >= 0)
        & (velo[..., 2] < max_high)
        & (depth.reshape(batch, -1) > 0)
    )
    if sparsity:
        # Parity note: the reference strides AFTER compaction (every k-th
        # surviving point); with static shapes we stride the pixel index,
        # which subsamples uniformly with the same density.
        idx = jnp.arange(height * width)[None, :]
        valid = valid & (idx % sparsity == 0)
    return velo, valid


class PseudoLiDAR:
    """Calibration-bound pseudo-LiDAR projector (host API).

    Parity with the reference class (PseudoLiDAR.py:5-109): constructed
    from a KITTI calib directory; .project_PL(depth) returns the compacted
    [N, 4] numpy cloud. The batched device API is .project_batch().
    """

    def __init__(self, calib_dir: str, sparsity: int = 0, max_high: float = 1.0):
        calib = Calibration(calib_dir)
        self.proj = jnp.asarray(calib.P, dtype=jnp.float32)
        self.velo_to_cam = jnp.asarray(calib.T_velo_cam, dtype=jnp.float32)
        self.sparsity = int(sparsity)
        self.max_high = float(max_high)

    def project_batch(self, depth: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[B, H, W] depth -> (points [B, H*W, 4], valid [B, H*W]) on device."""
        return depth_to_pointcloud(
            jnp.asarray(depth, dtype=jnp.float32),
            self.proj,
            self.velo_to_cam,
            sparsity=self.sparsity,
            max_high=self.max_high,
        )

    def project_PL(self, depth_img: np.ndarray) -> np.ndarray:
        """[H, W] depth -> [N, 4] numpy cloud (reference-compatible API)."""
        points, valid = self.project_batch(jnp.asarray(depth_img)[None])
        points = np.asarray(points[0])
        valid = np.asarray(valid[0])
        return points[valid]


def save_cloud(path: str, points: np.ndarray) -> None:
    """Write an [N, 4] cloud; format by extension. `.bin` = raw float32
    x/y/z/intensity rows (the KITTI velodyne wire format downstream 3D
    detectors consume — read back with geometry/oxts.load_velo_scan),
    anything else = numpy .npy."""
    if path.endswith(".bin"):
        np.ascontiguousarray(points, dtype=np.float32).tofile(path)
    else:
        np.save(path, points)
