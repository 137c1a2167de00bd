"""DispNetS — SfMLearner-style 7-down/7-up disparity network (Flax, NHWC).

Capability parity with /root/reference/models/depth/disp_net.py:51-141:
7 stride-2 encoder blocks (Conv+ReLU+BN+Conv+ReLU), 7 transpose-conv
decoder stages with skip concatenations, 4 sigmoid disparity heads scaled
alpha*sigma + beta (10, 0.01), coarse disparities bilinearly upsampled and
fed into the next decoder stage.

TPU design notes: all feature maps NHWC; the reference's crop_like calls
(disp_net.py:106-137) trim transpose-conv overshoot at input sizes that
are not multiples of 2^7. Shapes are static at trace time, so crop_like
here is a free static slice — arbitrary input sizes are supported, like
the reference.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_pseuso_lidar_tpu.models.layers import (
    DownsampleConvBN,
    TorchConv,
    TorchConvTranspose,
)
from unsupervised_pseuso_lidar_tpu.ops.resample import resize_bilinear


class DispNetS(nn.Module):
    """Returns a list of 4 disparity maps [B, H/2^s, W/2^s, 1], finest first."""

    alpha: float = 10.0
    beta: float = 0.01
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True) -> Sequence[jnp.ndarray]:
        conv_planes = [32, 64, 128, 256, 512, 512, 512]
        upconv_planes = [512, 512, 256, 128, 64, 32, 16]
        kernels = [7, 5, 3, 3, 3, 3, 3]

        encoder = []
        out = x
        for planes, k in zip(conv_planes, kernels):
            out = DownsampleConvBN(planes, k, dtype=self.dtype)(out, train=train)
            encoder.append(out)

        def crop_like(a, ref):
            # static-shape crop_like (/root/reference/models/depth/disp_net.py:44-46)
            return a[:, : ref.shape[1], : ref.shape[2], :]

        def upconv(features, inp, like):
            out = nn.relu(TorchConvTranspose(features, dtype=self.dtype)(inp))
            return crop_like(out, like)

        def iconv(features, inp):
            return nn.relu(TorchConv(features, 3, dtype=self.dtype)(inp))

        def predict_disp(inp):
            return nn.sigmoid(TorchConv(1, 3, dtype=self.dtype)(inp))

        out7 = iconv(
            upconv_planes[0],
            jnp.concatenate(
                [upconv(upconv_planes[0], encoder[6], encoder[5]), encoder[5]],
                -1,
            ),
        )
        out6 = iconv(
            upconv_planes[1],
            jnp.concatenate(
                [upconv(upconv_planes[1], out7, encoder[4]), encoder[4]], -1
            ),
        )
        out5 = iconv(
            upconv_planes[2],
            jnp.concatenate(
                [upconv(upconv_planes[2], out6, encoder[3]), encoder[3]], -1
            ),
        )
        out4 = iconv(
            upconv_planes[3],
            jnp.concatenate(
                [upconv(upconv_planes[3], out5, encoder[2]), encoder[2]], -1
            ),
        )
        disp4 = self.alpha * predict_disp(out4) + self.beta

        def up2(disp, like):
            return crop_like(
                resize_bilinear(disp, disp.shape[1] * 2, disp.shape[2] * 2),
                like,
            )

        out3 = iconv(
            upconv_planes[4],
            jnp.concatenate(
                [
                    upconv(upconv_planes[4], out4, encoder[1]),
                    encoder[1],
                    up2(disp4, encoder[1]),
                ],
                -1,
            ),
        )
        disp3 = self.alpha * predict_disp(out3) + self.beta

        out2 = iconv(
            upconv_planes[5],
            jnp.concatenate(
                [
                    upconv(upconv_planes[5], out3, encoder[0]),
                    encoder[0],
                    up2(disp3, encoder[0]),
                ],
                -1,
            ),
        )
        disp2 = self.alpha * predict_disp(out2) + self.beta

        out1 = iconv(
            upconv_planes[6],
            jnp.concatenate(
                [upconv(upconv_planes[6], out2, x), up2(disp2, x)], -1
            ),
        )
        disp1 = self.alpha * predict_disp(out1) + self.beta

        return [disp1, disp2, disp3, disp4]
