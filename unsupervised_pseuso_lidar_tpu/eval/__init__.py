from unsupervised_pseuso_lidar_tpu.eval.metrics import compute_errors

__all__ = ["compute_errors"]
