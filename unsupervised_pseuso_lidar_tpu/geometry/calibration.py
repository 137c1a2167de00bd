"""KITTI calibration parsing (host-side, numpy).

Capability parity with /root/reference/geometry/calibration.py:10-107 and
the duplicate parser in /root/reference/pseudo-lidar/utils/PseudoLiDAR.py:12-67
— the reference has two copies; this module is the single shared one for
both the training stack and the pseudo-LiDAR serving stack.

Exposes, for KITTI raw-format calib directories:
  K          — [3, 3] K_02 camera matrix
  P          — [3, 4] P_rect_02 rectified projection matrix
  R_rect     — [4, 4] homogeneous rectifying rotation (R_rect_02)
  T_velo_cam — [4, 4] velodyne -> reference-camera rigid transform
  T_imu_velo — [4, 4] IMU -> velodyne rigid transform
  imu_to_cam — [4, 4] R_rect @ T_velo_cam @ T_imu_velo (the composite the
               dataloader uses, /root/reference/dataloaders.py:155)
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def read_calib_file(filepath: str) -> Dict[str, np.ndarray]:
    """Parse a KITTI calibration text file into {key: float array}.

    Skips non-numeric values (dates). Parity:
    /root/reference/geometry/calibration.py:70-89.
    """
    data: Dict[str, np.ndarray] = {}
    with open(filepath, "r") as f:
        for line in f:
            line = line.rstrip()
            if not line or ":" not in line:
                continue
            key, value = line.split(":", 1)
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                pass
    return data


def transform_from_rot_trans(rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """[R|t] -> 4x4 homogeneous transform."""
    rot = np.asarray(rot, dtype=np.float64).reshape(3, 3)
    trans = np.asarray(trans, dtype=np.float64).reshape(3, 1)
    return np.vstack((np.hstack([rot, trans]), [0.0, 0.0, 0.0, 1.0]))


def inverse_rigid_transform(transform: np.ndarray) -> np.ndarray:
    """Invert a rigid transform: [R|t]^-1 = [R.T | -R.T t].

    Accepts 3x4 or 4x4; returns the same shape.
    Parity: /root/reference/pseudo-lidar/utils/PseudoLiDAR.py:39-46.
    """
    transform = np.asarray(transform, dtype=np.float64)
    rot_t = transform[:3, :3].T
    t_inv = -rot_t @ transform[:3, 3]
    out = np.zeros_like(transform)
    out[:3, :3] = rot_t
    out[:3, 3] = t_inv
    if transform.shape[0] == 4:
        out[3, 3] = 1.0
    return out


def decompose_projection(
    proj: np.ndarray,
    front_point: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Factor a 3x4 camera projection matrix into P = K [R | t].

    RQ-decomposes P[:, :3] (via numpy QR on the row/column-reversed
    matrix — no scipy dependency), then fixes signs so diag(K) > 0 and
    det(R) = +1, and recovers t = K^-1 P[:, 3].

    Capability parity: the reference's generic-sequence path factors
    projection matrices the same way for non-KITTI data
    (/root/reference/notes/toy_problem/dataloaders.py:37-54 `factor_P`,
    scipy.linalg.rq + sign fix; also the MATLAB helper
    /root/reference/notes/toy_problem/utils/decomposeP.m). The
    reference's python copy has a dead typo (`torch.fron_numpy`); this
    implements the intended math.

    Args:
      proj: [3, 4] projection matrix (any projective scale, incl.
        negative).
      front_point: optional world point known to be IN FRONT of the
        camera. Some classic multiview datasets (e.g. the Oxford
        dinosaur turntable the reference's toy problem uses) ship
        cameras whose canonical decomposition places the scene at
        NEGATIVE z; when `front_point` lands behind, the decomposition
        is chirality-flipped (D = diag(-1, 1, -1) absorbed into K and
        R, overall scale -1) so that positive ray depth means "in
        front". The flipped K keeps fx > 0, K[2,2] = 1 but has fy < 0
        (a y-axis flip — harmless to backproject/project, which never
        assume fy's sign); R stays a proper rotation.

    Returns:
      (K [3,3] upper-triangular with K[2,2]=1 and fx>0, R [3,3] with
      det +1, t [3]) such that K @ np.hstack([R, t[:, None]]) ~ proj
      (up to the overall projective scale of the input).
    """
    proj = np.asarray(proj, dtype=np.float64).reshape(3, 4)
    m = proj[:, :3]
    # RQ via QR: reverse rows/cols, QR the transpose, reverse back
    rev = np.eye(3)[::-1]
    q, r = np.linalg.qr((rev @ m).T)
    k = rev @ r.T @ rev
    rot = rev @ q.T
    # make diag(K) positive (absorb sign flips into R)
    sign = np.diag(np.sign(np.diag(k)))
    k = k @ sign
    rot = sign @ rot  # sign is its own inverse
    # det(R) must be +1; negating R (and t) flips the overall projective
    # scale of P, which is the same camera, and keeps diag(K) positive
    if np.linalg.det(rot) < 0:
        rot = -rot
        sign_t = -1.0
    else:
        sign_t = 1.0
    t = np.linalg.solve(k, sign_t * proj[:, 3])
    k = k / k[2, 2]
    if front_point is not None:
        z = rot[2] @ np.asarray(front_point, np.float64) + t[2]
        if z < 0:
            # chirality flip: K' = -K D, R' = D R, t' = D t (overall
            # projective scale -1). D = diag(-1, 1, -1) keeps fx > 0 and
            # det(R') = +1 while negating every ray's z.
            d = np.diag([-1.0, 1.0, -1.0])
            k = -(k @ d)
            rot = d @ rot
            t = d @ t
    return k, rot, t


class Calibration:
    """KITTI raw calibration bundle for one drive date.

    Args:
      calib_dir: directory (or prefix) containing calib_velo_to_cam.txt,
        calib_cam_to_cam.txt, and calib_imu_to_velo.txt. Unlike the
        reference (which requires a trailing separator because it does raw
        string concatenation, calibration.py:39-41), paths are joined
        robustly.
    """

    def __init__(self, calib_dir: str):
        self.calib_dir = calib_dir

        def path(name: str) -> str:
            candidate = os.path.join(calib_dir, name)
            # Tolerate prefix-style paths ("…/2011_09_26" + "calib_x.txt")
            if not os.path.exists(candidate) and os.path.exists(calib_dir + name):
                candidate = calib_dir + name
            return candidate

        velo_to_cam = read_calib_file(path("calib_velo_to_cam.txt"))
        cam_to_cam = read_calib_file(path("calib_cam_to_cam.txt"))
        imu_to_velo = read_calib_file(path("calib_imu_to_velo.txt"))

        self.K = cam_to_cam["K_02"].reshape(3, 3)
        self.P = cam_to_cam["P_rect_02"].reshape(3, 4)
        self.R_rect = transform_from_rot_trans(
            cam_to_cam["R_rect_02"], np.zeros(3)
        )
        self.T_velo_cam = transform_from_rot_trans(
            velo_to_cam["R"], velo_to_cam["T"]
        )
        self.T_imu_velo = transform_from_rot_trans(
            imu_to_velo["R"], imu_to_velo["T"]
        )

    @property
    def imu_to_cam(self) -> np.ndarray:
        """Composite IMU -> rectified-camera transform
        (parity: /root/reference/dataloaders.py:155)."""
        return self.R_rect @ self.T_velo_cam @ self.T_imu_velo

    @property
    def intrinsics(self) -> np.ndarray:
        """[3, 3] intrinsics of the rectified camera 2 (P[:, :3]), the
        matrix the training stack uses
        (/root/reference/dataloaders.py:154)."""
        return self.P[:, :3].copy()
