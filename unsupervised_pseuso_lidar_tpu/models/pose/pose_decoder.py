"""PoseDecoder — monodepth2-style pose head over encoder features.

Capability parity with /root/reference/models/pose/pose_decoder.py:11-50:
per-input 1x1 squeeze convs + ReLU, concat, three 3x3/1x1 convs, global
mean, 0.01 scale, split into (axisangle, translation) each
[B, num_frames, 1, 3]. Not wired to any reference config but part of the
model zoo (SURVEY.md C12).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_pseuso_lidar_tpu.models.layers import TorchConv


class PoseDecoder(nn.Module):
    num_input_features: int = 2
    num_frames_to_predict_for: int | None = None
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, input_features: Sequence[Sequence[jnp.ndarray]]):
        num_frames = (
            self.num_frames_to_predict_for
            if self.num_frames_to_predict_for is not None
            else self.num_input_features - 1
        )
        last = [f[-1] for f in input_features]
        squeeze = TorchConv(256, 1, dtype=self.dtype)
        cat = jnp.concatenate([nn.relu(squeeze(f)) for f in last], axis=-1)

        out = nn.relu(TorchConv(256, 3, stride=self.stride, dtype=self.dtype)(cat))
        out = nn.relu(TorchConv(256, 3, stride=self.stride, dtype=self.dtype)(out))
        out = TorchConv(6 * num_frames, 1, dtype=self.dtype)(out)
        out = out.mean(axis=(1, 2))
        out = 0.01 * out.reshape(-1, num_frames, 1, 6)
        return out[..., :3], out[..., 3:]
