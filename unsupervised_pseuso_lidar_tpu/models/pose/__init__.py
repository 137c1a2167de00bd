from unsupervised_pseuso_lidar_tpu.models.pose.posenet import PoseNet
from unsupervised_pseuso_lidar_tpu.models.pose.pose_fc import PoseFc
from unsupervised_pseuso_lidar_tpu.models.pose.pose_decoder import PoseDecoder

__all__ = ["PoseNet", "PoseFc", "PoseDecoder"]
