"""StnDispNet — GroupNorm 4-down/4-up disparity net with an optional
spatial-transformer localization head (Flax, NHWC).

Capability parity with /root/reference/models/depth/stn_depth_net.py:36-122.
The reference's STN branch is defined but disabled in forward
(stn_depth_net.py:108); here it is gated by `use_stn` (default False, same
effective behavior) and fully functional when enabled — affine_grid +
bilinear resampling via ops.resample.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_pseuso_lidar_tpu.models.layers import (
    DownsampleConvGN,
    TorchConv,
    UpconvGN,
)
from unsupervised_pseuso_lidar_tpu.ops.resample import grid_sample


def affine_grid(theta: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """torch.nn.functional.affine_grid equivalent (align_corners=False).

    Args:
      theta: [B, 2, 3] affine matrices over normalized coords.
    Returns:
      [B, H, W, 2] sampling grid in [-1, 1].
    """
    # align_corners=False: normalized coords of pixel centers
    xs = (jnp.arange(width, dtype=jnp.float32) * 2 + 1) / width - 1
    ys = (jnp.arange(height, dtype=jnp.float32) * 2 + 1) / height - 1
    xx = jnp.broadcast_to(xs[None, :], (height, width))
    yy = jnp.broadcast_to(ys[:, None], (height, width))
    ones = jnp.ones_like(xx)
    base = jnp.stack([xx, yy, ones], axis=-1)  # [H, W, 3]
    return jnp.einsum("bij,hwj->bhwi", theta, base)


class StnDispNet(nn.Module):
    use_stn: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.use_stn:
            loc = x
            for width in (16, 32, 32, 32, 32):
                loc = DownsampleConvGN(width, dtype=self.dtype)(loc)
            loc = loc.reshape(loc.shape[0], -1)
            for features in (1280, 256, 128):
                loc = nn.relu(nn.Dense(features, dtype=self.dtype)(loc))
            theta = nn.Dense(
                6,
                kernel_init=nn.initializers.zeros,
                bias_init=lambda *_: jnp.array(
                    [1.0, 0.0, 0.0, 0.0, 1.0, 0.0]
                ),
                dtype=self.dtype,
            )(loc).reshape(-1, 2, 3)
            grid = affine_grid(theta, x.shape[1], x.shape[2])
            x = grid_sample(x, grid, align_corners=False)

        out = x
        for width in (32, 64, 128, 256):
            out = DownsampleConvGN(width, dtype=self.dtype)(out)
        for width in (128, 64, 32, 16):
            out = UpconvGN(width, dtype=self.dtype)(out)
        disp = nn.sigmoid(TorchConv(1, 3, dtype=self.dtype)(out))
        return [disp]
