"""Model registry — explicit name -> constructor map.

Replaces the reference's dynamic importlib + getmembers(isclass) reflection
(/root/reference/trainer.py:154-170) with a static registry: config files
keep the same `model.{depth,pose}.name` schema but resolution is explicit,
validated, and import-cycle free.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(name: str):
    def wrap(ctor):
        MODEL_REGISTRY[name] = ctor
        return ctor

    return wrap


def build_model(name: str, **kwargs):
    """Instantiate a registered model by config name.

    Raises a helpful error instead of the reference's silent None
    (/root/reference/trainer.py:162-167 leaves model=None on a typo).
    """
    _populate()
    if name not in MODEL_REGISTRY:
        known = ", ".join(sorted(MODEL_REGISTRY))
        raise KeyError(f"Unknown model '{name}'. Registered models: {known}")
    return MODEL_REGISTRY[name](**kwargs)


def _populate():
    """Deferred imports to avoid import cycles at package load."""
    if MODEL_REGISTRY:
        return
    from unsupervised_pseuso_lidar_tpu.models.depth.bts import BtsModel
    from unsupervised_pseuso_lidar_tpu.models.depth.dispnet import DispNetS
    from unsupervised_pseuso_lidar_tpu.models.depth.resnet_dispnet import DispResNet
    from unsupervised_pseuso_lidar_tpu.models.depth.stn_dispnet import StnDispNet
    from unsupervised_pseuso_lidar_tpu.models.pose.posenet import PoseNet
    from unsupervised_pseuso_lidar_tpu.models.pose.pose_fc import PoseFc
    from unsupervised_pseuso_lidar_tpu.models.pose.pose_decoder import PoseDecoder

    MODEL_REGISTRY.update(
        {
            "BtsModel": BtsModel,
            "DispNetS": DispNetS,
            "DispResNet": DispResNet,
            "StnDispNet": StnDispNet,
            "PoseNet": PoseNet,
            "PoseFc": PoseFc,
            "PoseDecoder": PoseDecoder,
        }
    )
