from unsupervised_pseuso_lidar_tpu.ops.pallas.photometric import (
    ssim_distance_pallas,
    photometric_map_pallas,
)

__all__ = ["ssim_distance_pallas", "photometric_map_pallas"]
