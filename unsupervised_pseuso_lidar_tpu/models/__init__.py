from unsupervised_pseuso_lidar_tpu.models.registry import (
    MODEL_REGISTRY,
    build_model,
    register_model,
)

__all__ = ["MODEL_REGISTRY", "build_model", "register_model"]
