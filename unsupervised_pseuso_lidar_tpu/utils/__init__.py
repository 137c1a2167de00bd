from unsupervised_pseuso_lidar_tpu.utils.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_image,
    unnormalize_image,
    load_image,
)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "normalize_image",
    "unnormalize_image",
    "load_image",
]
