"""PoseNet — 7-stride-2-conv trunk over the concatenated frame triplet.

Capability parity with /root/reference/models/pose/pose_net.py:31-77:
conv channels (16, 32, 64, 128, 256, 256, 256) with kernels (7, 5, 3...),
1x1 pose head, global average over H, W, output 0.06 * pose reshaped to
[B, num_refs, 6]. The reference's GroupNorm is commented out
(pose_net.py:27) so the trunk is Conv+ReLU only — replicated.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_pseuso_lidar_tpu.models.layers import TorchConv


class PoseNet(nn.Module):
    nb_ref_imgs: int = 2
    dtype: jnp.dtype | None = None
    # Run the first trunk convs over 2x2-space-to-depth-blocked input
    # (TorchConv.space_to_depth). The 9-channel 7x7/s2 conv1 at full res
    # fills 9 of the MXU's 128 input lanes and traced at 1.21 ms fwd +
    # 1.92 ms grad_filter + a 0.76 ms input layout copy in the b12
    # 640x192 production step (benchmarks/conv_diag.py, r5); the blocked
    # 4x4/s1 form over 36 lanes removes the copy and tiles ~4x denser.
    # Checkpoint-identical (same [k,k,ci,co] params). 0 = plain convs.
    s2d_convs: int = 2

    @nn.compact
    def __call__(self, image, context: Sequence[jnp.ndarray]):
        assert len(context) == self.nb_ref_imgs
        x = jnp.concatenate([image, *context], axis=-1)
        channels = (16, 32, 64, 128, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        # the reference trains PoseNet from xavier_uniform kernels with
        # ZERO biases (init_weights, pose_net.py:51-56; trainer.py:168
        # applies it to pose models when from_scratch)
        init = dict(
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
        )
        for i, (width, k) in enumerate(zip(channels, kernels)):
            x = nn.relu(
                TorchConv(
                    width, k, stride=2, dtype=self.dtype,
                    space_to_depth=i < self.s2d_convs, **init,
                )(x)
            )
        pose = TorchConv(6 * self.nb_ref_imgs, 1, dtype=self.dtype, **init)(x)
        pose = pose.mean(axis=(1, 2))  # global average over H, W
        return 0.06 * pose.reshape(pose.shape[0], self.nb_ref_imgs, 6)
