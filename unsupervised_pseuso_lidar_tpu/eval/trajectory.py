"""Trajectory integration + KITTI-odometry-format export.

The reference predicts frame-to-frame poses but never composes them into
a trajectory (its pose inspection is the hand-pasted dump in
/root/reference/notes/what_the_hell.txt). This module integrates the
pose net's relative transforms into camera-to-world poses and writes the
standard KITTI odometry format (12 numbers per line: the flattened 3x4
[R|t] of camera k in the frame of camera 0) — the format the
SfMLearner-family pose benchmarks consume.

Convention: a relative 6-vec (tgt -> ref) parameterizes the transform
that maps TGT-frame points into the REF frame, X_ref = R X_tgt + t (the
warp convention, geometry/se3.pose_matrix). The world pose therefore
composes as P_ref = P_tgt @ T^{-1}.
"""

from __future__ import annotations

from typing import List

import numpy as np

from unsupervised_pseuso_lidar_tpu.geometry.se3 import (
    euler2mat,
    pose_matrix,
)


def relative_matrices(rel6: np.ndarray, mode: str) -> np.ndarray:
    """[N, 6] relative vectors -> [N, 4, 4] transforms (own convention)."""
    import jax.numpy as jnp

    rel6 = np.asarray(rel6, np.float64)
    if mode == "axis_angle":
        return np.asarray(pose_matrix(jnp.asarray(rel6, jnp.float32)),
                          np.float64)
    if mode == "euler":
        rot = np.asarray(euler2mat(jnp.asarray(rel6[:, :3], jnp.float32)),
                         np.float64)
        mats = np.tile(np.eye(4), (len(rel6), 1, 1))
        mats[:, :3, :3] = rot
        mats[:, :3, 3] = rel6[:, 3:]
        return mats
    raise ValueError(f"Unknown pose convention: {mode!r}")


def integrate_relative_poses(
    rel6: np.ndarray, mode: str = "axis_angle"
) -> np.ndarray:
    """[N, 6] successive (t -> t+1) vectors -> [N+1, 4, 4] world poses.

    P_0 = I; P_{k+1} = P_k @ inv(T_{k -> k+1}). Accumulates in float64 on
    host (a 1,000-frame drive composes 1,000 matmuls — fp32 drift is
    visible at that depth, and this runs once per export, not per step).
    """
    mats = relative_matrices(rel6, mode)
    poses = np.empty((len(mats) + 1, 4, 4))
    poses[0] = np.eye(4)
    for k, t_rel in enumerate(mats):
        rot_t = t_rel[:3, :3].T
        inv = np.eye(4)
        inv[:3, :3] = rot_t
        inv[:3, 3] = -rot_t @ t_rel[:3, 3]
        poses[k + 1] = poses[k] @ inv
    return poses


def kitti_odometry_lines(poses: np.ndarray) -> List[str]:
    """[N, 4, 4] world poses -> KITTI odometry lines (3x4 row-major)."""
    return [
        " ".join(f"{v:.9e}" for v in pose[:3, :4].reshape(-1))
        for pose in np.asarray(poses)
    ]
