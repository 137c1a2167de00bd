from unsupervised_pseuso_lidar_tpu.models.depth.bts import BtsModel
from unsupervised_pseuso_lidar_tpu.models.depth.dispnet import DispNetS
from unsupervised_pseuso_lidar_tpu.models.depth.resnet_dispnet import (
    DepthDecoder,
    DispResNet,
    ResnetEncoder,
)
from unsupervised_pseuso_lidar_tpu.models.depth.stn_dispnet import StnDispNet

__all__ = ["BtsModel", "DispNetS", "DispResNet", "ResnetEncoder", "DepthDecoder", "StnDispNet"]
