from unsupervised_pseuso_lidar_tpu.ops.resample import (
    grid_sample,
    resize_bilinear,
    resize_nearest,
    upsample2x_nearest,
)
from unsupervised_pseuso_lidar_tpu.ops.ssim import (
    ssim_distance,
    ssim_distance_fused,
)

__all__ = [
    "grid_sample",
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_nearest",
    "ssim_distance",
    "ssim_distance_fused",
]
