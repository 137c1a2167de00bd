"""Ground-truth depth generation from raw Velodyne scans.

Implements the reference's open TODO ("use image transforms on velodyne
points to create GT", /root/reference/dataloaders.py:174-175): when the
data_depth_annotated archive is absent, sparse GT depth images are
rasterized directly from the drive's velodyne_points/*.bin scans with the
on-device scatter-min projector (pseudolidar/velo2img.py).
"""

from __future__ import annotations

import os

import numpy as np

from unsupervised_pseuso_lidar_tpu.geometry.calibration import Calibration
from unsupervised_pseuso_lidar_tpu.geometry.oxts import load_velo_scan
from unsupervised_pseuso_lidar_tpu.pseudolidar.velo2img import (
    project_velo_to_depth_image,
)


def velo_path_for_image(image_path: str) -> str:
    """image_02/data/xxx.png -> velodyne_points/data/xxx.bin."""
    frame = os.path.splitext(os.path.basename(image_path))[0]
    drive_dir = os.path.dirname(os.path.dirname(os.path.dirname(image_path)))
    return os.path.join(drive_dir, "velodyne_points", "data", frame + ".bin")


def depth_gt_from_velo(
    velo_file: str,
    calib: Calibration,
    width: int,
    height: int,
    max_dist: float = 120.0,
    orig_size: "tuple[int, int] | None" = None,
) -> np.ndarray:
    """Rasterize one velodyne scan into an [H, W] sparse depth image.

    Points are projected with P_rect_02 @ R_rect @ T_velo_cam (the KITTI
    rectified-camera chain, /root/reference/geometry/calibration.py:14-17);
    0 marks pixels without a return, matching the data_depth_annotated
    convention the eval metrics mask on.

    orig_size: (orig_h, orig_w) of the camera frame the calibration refers
    to. When (width, height) differ, the projection matrix rows are scaled
    so points land directly on the resized grid — sparse depth VALUES are
    metric and must never be interpolated, so rescaling happens in the
    projection, not on the raster.
    """
    import jax.numpy as jnp

    scan = load_velo_scan(velo_file)
    velo_to_rect = calib.R_rect @ calib.T_velo_cam
    proj = calib.P.astype(np.float32).copy()
    if orig_size is not None:
        orig_h, orig_w = orig_size
        proj[0] *= width / orig_w
        proj[1] *= height / orig_h
    img = project_velo_to_depth_image(
        jnp.asarray(scan[:, :3]),
        jnp.asarray(velo_to_rect, dtype=jnp.float32),
        jnp.asarray(proj),
        width=width,
        height=height,
        max_dist=max_dist,
    )
    return np.asarray(img)
