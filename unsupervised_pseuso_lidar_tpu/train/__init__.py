from unsupervised_pseuso_lidar_tpu.train.config import Config, load_config
from unsupervised_pseuso_lidar_tpu.train.trainer import (
    Trainer,
    TrainState,
    create_train_state,
    make_train_step,
)

__all__ = [
    "Config",
    "load_config",
    "Trainer",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
