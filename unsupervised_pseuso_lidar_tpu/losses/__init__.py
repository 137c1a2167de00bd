from unsupervised_pseuso_lidar_tpu.losses.photometric import (
    l1_loss,
    photometric_loss,
)
from unsupervised_pseuso_lidar_tpu.losses.smoothness import smooth_loss
from unsupervised_pseuso_lidar_tpu.losses.reprojection import (
    reprojection_loss,
    min_reprojection_loss,
)
from unsupervised_pseuso_lidar_tpu.losses.total import Losses, total_loss

__all__ = [
    "l1_loss",
    "photometric_loss",
    "smooth_loss",
    "reprojection_loss",
    "min_reprojection_loss",
    "Losses",
    "total_loss",
]
