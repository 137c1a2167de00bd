from unsupervised_pseuso_lidar_tpu.pseudolidar.export import (
    export_program,
    load_exported,
    make_depth_cloud_fn,
    make_depth_fn,
)
from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
    PseudoLiDAR,
    depth_to_pointcloud,
)
from unsupervised_pseuso_lidar_tpu.pseudolidar.velo2img import (
    project_velo_to_depth_image,
    project_img_to_velo,
)

__all__ = [
    "PseudoLiDAR",
    "depth_to_pointcloud",
    "export_program",
    "load_exported",
    "make_depth_cloud_fn",
    "make_depth_fn",
    "project_velo_to_depth_image",
    "project_img_to_velo",
]
