from unsupervised_pseuso_lidar_tpu.eval.metrics import compute_errors
from unsupervised_pseuso_lidar_tpu.eval.pose import (
    make_pose_eval_step,
    pose_errors,
)

__all__ = ["compute_errors", "pose_errors", "make_pose_eval_step"]
