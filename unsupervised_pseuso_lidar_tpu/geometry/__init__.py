from unsupervised_pseuso_lidar_tpu.geometry.se3 import (
    euler2mat,
    mat2euler,
    rot_from_axisangle,
    transformation_from_parameters,
    pose_vec2mat,
    invert_pose,
    pose_matrix,
)
from unsupervised_pseuso_lidar_tpu.geometry.camera import (
    pixel_grid,
    backproject,
    project,
    scale_intrinsics,
)
from unsupervised_pseuso_lidar_tpu.geometry.warp import inverse_warp, disp_to_depth
from unsupervised_pseuso_lidar_tpu.geometry.calibration import (
    Calibration,
    decompose_projection,
)
from unsupervised_pseuso_lidar_tpu.geometry import oxts

__all__ = [
    "euler2mat",
    "mat2euler",
    "rot_from_axisangle",
    "transformation_from_parameters",
    "pose_vec2mat",
    "invert_pose",
    "pose_matrix",
    "pixel_grid",
    "backproject",
    "project",
    "scale_intrinsics",
    "inverse_warp",
    "disp_to_depth",
    "Calibration",
    "decompose_projection",
    "oxts",
]
