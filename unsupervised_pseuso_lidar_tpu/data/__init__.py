from unsupervised_pseuso_lidar_tpu.data.synthetic import (
    SyntheticTripletDataset,
    synthetic_triplet_batch,
)

__all__ = ["SyntheticTripletDataset", "synthetic_triplet_batch"]
