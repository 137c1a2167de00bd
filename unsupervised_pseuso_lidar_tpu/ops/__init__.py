from unsupervised_pseuso_lidar_tpu.ops.resample import (
    band_coverage,
    grid_sample,
    grid_sample_mxu,
    resize_bilinear,
    resize_nearest,
    upsample2x_nearest,
)
from unsupervised_pseuso_lidar_tpu.ops.ssim import (
    ssim_distance,
    ssim_distance_fused,
)

__all__ = [
    "band_coverage",
    "grid_sample",
    "grid_sample_mxu",
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_nearest",
    "ssim_distance",
    "ssim_distance_fused",
]
