"""KITTI OXTS GPS/IMU parsing -> SE(3) world poses (host-side, numpy).

Capability parity with /root/reference/geometry/oxts_parser.py:10-162:
Mercator projection of lat/lon to metric translation plus Euler-angle
rotation, producing T_w_imu per packet; also the velodyne .bin loader.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

EARTH_RADIUS_M = 6378137.0


class OxtsPacket(NamedTuple):
    """Full 30-field KITTI OXTS packet (dataformat.txt order).

    Parity: /root/reference/geometry/oxts_parser.py:10-18 — position and
    attitude, then velocities (vn/ve north/east, vf/vl/vu
    forward/left/up), accelerations (ax/ay/az body, af/al/au
    forward/left/up), angular rates (wx..wu), accuracy estimates, and
    navigation status fields. Pose assembly only consumes the first 6;
    the remainder is exposed for downstream consumers (e.g. velocity
    supervision or ego-motion priors)."""

    lat: float
    lon: float
    alt: float
    roll: float
    pitch: float
    yaw: float
    vn: float = 0.0
    ve: float = 0.0
    vf: float = 0.0
    vl: float = 0.0
    vu: float = 0.0
    ax: float = 0.0
    ay: float = 0.0
    az: float = 0.0
    af: float = 0.0
    al: float = 0.0
    au: float = 0.0
    wx: float = 0.0
    wy: float = 0.0
    wz: float = 0.0
    wf: float = 0.0
    wl: float = 0.0
    wu: float = 0.0
    pos_accuracy: float = 0.0
    vel_accuracy: float = 0.0
    navstat: float = 0.0
    numsats: float = 0.0
    posmode: float = 0.0
    velmode: float = 0.0
    orimode: float = 0.0


class OxtsData(NamedTuple):
    """Packet + assembled world pose (parity: oxts_parser.py:21)."""

    packet: OxtsPacket
    T_w_imu: np.ndarray


def rotx(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)


def roty(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)


def rotz(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)


def pose_from_oxts_packet(packet: OxtsPacket, scale: float) -> np.ndarray:
    """One OXTS packet -> 4x4 T_w_imu via Mercator projection.

    Parity: /root/reference/geometry/oxts_parser.py:83-102 (+ the
    transform assembly at :135).
    """
    tx = scale * packet.lon * np.pi * EARTH_RADIUS_M / 180.0
    ty = scale * EARTH_RADIUS_M * np.log(
        np.tan((90.0 + packet.lat) * np.pi / 360.0)
    )
    tz = packet.alt
    rot = rotz(packet.yaw) @ roty(packet.pitch) @ rotx(packet.roll)
    pose = np.eye(4, dtype=np.float64)
    pose[:3, :3] = rot
    pose[:3, 3] = (tx, ty, tz)
    return pose


def parse_oxts_line(line: str) -> OxtsPacket:
    """Parse one line of a KITTI oxts/data/*.txt file (all 30 fields;
    short lines are zero-padded past the 6 pose fields)."""
    values = [float(v) for v in line.split()[:30]]
    if len(values) < 6:
        raise ValueError(f"OXTS line has {len(values)} fields, need >= 6")
    return OxtsPacket(*values)


def load_oxts_packets_and_poses(oxts_files: Sequence[str]) -> List[np.ndarray]:
    """Read OXTS files -> list of 4x4 T_w_imu world poses.

    The Mercator scale is fixed from the first packet's latitude, exactly
    like the reference (/root/reference/geometry/oxts_parser.py:105-139);
    like the reference, translations are NOT re-origined (the `t - origin`
    change was left commented out at oxts_parser.py:135) — relative poses
    cancel the offset downstream.
    """
    return [d.T_w_imu for d in load_oxts_data(oxts_files)]


def load_oxts_data(oxts_files: Sequence[str]) -> List[OxtsData]:
    """Read OXTS files -> list of (packet, T_w_imu) like the reference's
    load_oxts_packets_and_poses return shape
    (/root/reference/geometry/oxts_parser.py:105-139) — full packets for
    consumers that need velocities/accelerations."""
    scale = None
    out: List[OxtsData] = []
    for filename in oxts_files:
        with open(filename, "r") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                packet = parse_oxts_line(line)
                if scale is None:
                    scale = np.cos(packet.lat * np.pi / 180.0)
                out.append(OxtsData(packet, pose_from_oxts_packet(packet, scale)))
    return out


def axis_angle_from_matrix(rot: np.ndarray) -> np.ndarray:
    """SO(3) log map: [3, 3] rotation -> axis-angle vector (host numpy).

    Stable at small angles (first-order skew extraction) and clamped at
    the arccos boundary; inter-frame KITTI rotations are << pi so the
    theta ~ pi singular branch is not needed."""
    trace = float(np.trace(rot))
    cos = np.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = float(np.arccos(cos))
    skew = np.array(
        [rot[2, 1] - rot[1, 2], rot[0, 2] - rot[2, 0], rot[1, 0] - rot[0, 1]]
    )
    if theta < 1e-7:
        return 0.5 * skew  # log(R) ~ (R - R^T)/2 for small angles
    return skew * (theta / (2.0 * np.sin(theta)))


def relative_pose_6dof(
    origin_world: np.ndarray, target_world: np.ndarray, imu_to_cam: np.ndarray
) -> np.ndarray:
    """Camera-frame relative odometry as a WARP-CONVENTION 6-vector
    [rx, ry, rz, tx, ty, tz] (axis-angle rotation, origin -> target).

    The returned vector parameterizes the transform that maps ORIGIN
    (target-frame) camera coordinates into the TARGET (reference-frame)
    camera — exactly the pose-net output convention consumed by the warp
    (geometry/se3.pose_matrix), so `action.semi_sup_pose` is a drop-in
    pose-net replacement and eval/pose.py compares like with like. The
    synthetic dataset's oxts field uses the same convention
    (data/synthetic.py).

    Documented deviations from the reference assembly
    (/root/reference/dataloaders.py:65-69,108-116):
      * direction: the reference composes inv(T_w_tgt) @ T_w_ref — the
        ref->tgt transform, the INVERSE of what its own warp consumes,
        which sign-flips every translation fed to the semi-supervised
        loss (the confusion its notes/what_the_hell.txt pose dumps
        chase). Here: C @ inv(T_w_ref) @ T_w_tgt @ C^-1.
      * rotation: the reference zeroes the block with an open
        "TODO: rotation relative" (dataloaders.py:114-116); implemented
        here as the axis-angle log of the relative rotation (matching
        the warp's pose parameterization, not the TODO's euler sketch).
    """
    cam_from_imu = imu_to_cam
    odo = (
        cam_from_imu
        @ np.linalg.inv(target_world)
        @ origin_world
        @ np.linalg.inv(cam_from_imu)
    )
    return np.concatenate(
        [axis_angle_from_matrix(odo[:3, :3]), odo[:3, 3]]
    ).astype(np.float32)


def load_velo_scan(filename: str) -> np.ndarray:
    """Load a KITTI velodyne .bin scan -> [N, 4] (x, y, z, reflectance).

    Parity: /root/reference/geometry/oxts_parser.py:153-156."""
    return np.fromfile(filename, dtype=np.float32).reshape(-1, 4)
