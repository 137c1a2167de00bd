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


def _rot_from_axisangle64(vec: np.ndarray) -> np.ndarray:
    """[N, 3] float64 axis-angle -> [N, 3, 3] exact Rodrigues rotations.

    Host-side float64 twin of geometry/se3.rot_from_axisangle (same
    convention; that one runs regularized fp32 inside jitted steps).
    R = I + a*K + b*K^2 with K = skew(vec), a = sin(t)/t,
    b = (1-cos(t))/t^2, series-expanded below t ~ 1e-8 so the chain
    composition keeps full double precision at every link.
    """
    vec = np.asarray(vec, np.float64)
    theta = np.linalg.norm(vec, axis=-1)
    t2 = theta * theta
    small = theta < 1e-8
    safe_t = np.where(small, 1.0, theta)
    a = np.where(small, 1.0 - t2 / 6.0, np.sin(safe_t) / safe_t)
    b = np.where(small, 0.5 - t2 / 24.0, (1.0 - np.cos(safe_t)) / (safe_t**2))
    x, y, z = vec[:, 0], vec[:, 1], vec[:, 2]
    zero = np.zeros_like(x)
    k = np.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(-1, 3, 3)
    return (
        np.eye(3)[None]
        + a[:, None, None] * k
        + b[:, None, None] * (k @ k)
    )


def _euler2mat64(angles: np.ndarray) -> np.ndarray:
    """[N, 3] float64 (x, y, z) angles -> R = Rx @ Ry @ Rz (float64 twin
    of geometry/se3.euler2mat, same composition order)."""
    angles = np.asarray(angles, np.float64)
    x, y, z = angles[:, 0], angles[:, 1], angles[:, 2]
    cx, sx = np.cos(x), np.sin(x)
    cy, sy = np.cos(y), np.sin(y)
    cz, sz = np.cos(z), np.sin(z)
    zero, one = np.zeros_like(x), np.ones_like(x)
    zmat = np.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], axis=-1
    ).reshape(-1, 3, 3)
    ymat = np.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], axis=-1
    ).reshape(-1, 3, 3)
    xmat = np.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], axis=-1
    ).reshape(-1, 3, 3)
    return xmat @ ymat @ zmat


def relative_matrices(rel6: np.ndarray, mode: str) -> np.ndarray:
    """[N, 6] relative vectors -> [N, 4, 4] transforms (own convention).

    Pure host float64: the links feed a long matrix-product chain, so
    rounding them to fp32 first (e.g. by reusing the jitted se3 helpers)
    would re-inject ~1e-7 error at every composition step."""
    rel6 = np.asarray(rel6, np.float64)
    if mode == "axis_angle":
        rot = _rot_from_axisangle64(rel6[:, :3])
    elif mode == "euler":
        rot = _euler2mat64(rel6[:, :3])
    else:
        raise ValueError(f"Unknown pose convention: {mode!r}")
    mats = np.tile(np.eye(4), (len(rel6), 1, 1))
    mats[:, :3, :3] = rot
    mats[:, :3, 3] = rel6[:, 3:]
    return mats


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
