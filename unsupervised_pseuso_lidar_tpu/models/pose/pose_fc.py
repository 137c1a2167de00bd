"""PoseFc — PoseNet trunk with a fully-connected pose head.

Capability parity with /root/reference/models/pose/pose_fc.py:21-85: same
7-conv trunk, 1x1 pose conv, then FC (flatten -> 128 -> 32 -> 12), reshaped
to [B, 2, 6] with the rotation block zeroed (pose_fc.py:83 — the reference
trains translation-only through this head; replicated, including the
stop-gradient effect of the hard zero).

This is the pose model of record (configs/basic_config.yaml:8-9).

Design deviation (documented): the reference hardcodes the flatten size to
12*3*10 (pose_fc.py:40,80), binding the net to 384x1280 inputs. Here the
Dense layer infers its input width at init, so any resolution works; the
torch-checkpoint importer permutes the FC rows from the reference's CHW
flatten order to our HWC order (see train/checkpoint.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_pseuso_lidar_tpu.models.layers import TorchConv


class PoseFc(nn.Module):
    nb_ref_imgs: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image, context: Sequence[jnp.ndarray]):
        assert len(context) == self.nb_ref_imgs
        x = jnp.concatenate([image, *context], axis=-1)
        channels = (16, 32, 64, 128, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        for width, k in zip(channels, kernels):
            x = nn.relu(TorchConv(width, k, stride=2, dtype=self.dtype)(x))
        x = TorchConv(6 * self.nb_ref_imgs, 1, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(32, dtype=self.dtype)(x))
        x = nn.Dense(
            12, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )(x)
        pose = x.reshape(x.shape[0], self.nb_ref_imgs, 6)
        # Zero the rotation block (reference pose_fc.py:83) — translation-only.
        return jnp.concatenate(
            [jnp.zeros_like(pose[..., :3]), pose[..., 3:]], axis=-1
        )
