"""BTS ("From Big to Small") metric-depth network — the serving-side model
of the pseudo-LiDAR pipeline (Flax, NHWC).

Capability parity with /root/reference/pseudo-lidar/utils/model.py:21-272:
DenseNet-161 feature encoder (implemented natively — torchvision is not a
dependency), decoder with the dilated-ASPP stack (dilations 3/6/12/18/24),
local-planar-guidance heads at 8x/4x/2x, and the final sigmoid depth
scaled by max_depth=80. forward(x, focal) returns the same 5-tuple
(depth_8x8_scaled, depth_4x4_scaled, depth_2x2_scaled, reduc1x1,
final_depth); focal is accepted and unused, as in the reference
(model.py:235 leaves the focal scaling commented out).

TPU notes: the LPG expansion (repeat_interleave + plane-ray division,
model.py:102-116) is expressed as reshape/broadcast so XLA fuses it; all
convs are MXU-shaped NHWC with torch-compatible padding.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_pseuso_lidar_tpu.models.layers import TorchConv
from unsupervised_pseuso_lidar_tpu.ops.resample import (
    resize_nearest,
    upsample2x_nearest,
)

DENSENET161_BLOCKS = (6, 12, 36, 24)
DENSENET161_GROWTH = 48
DENSENET161_INIT = 96
BN_SIZE = 4


class _BN(nn.Module):
    momentum: float = 0.01
    eps: float = 1.1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,  # torch momentum convention
            epsilon=self.eps,
            dtype=self.dtype,
        )(x)


class DenseLayer(nn.Module):
    """torchvision DenseLayer: BN-ReLU-1x1 -> BN-ReLU-3x3, concat input."""

    growth: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(_BN(eps=1e-5, momentum=0.1, dtype=self.dtype)(x, train))
        out = TorchConv(BN_SIZE * self.growth, 1, use_bias=False,
                        dtype=self.dtype)(out)
        out = nn.relu(_BN(eps=1e-5, momentum=0.1, dtype=self.dtype)(out, train))
        out = TorchConv(self.growth, 3, use_bias=False, dtype=self.dtype)(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet161Encoder(nn.Module):
    """DenseNet-161 feature pyramid.

    Returns [input, relu0, pool0, transition1, transition2, norm5] —
    the skip_feat list of the reference encoder (model.py:249-260), with
    channel widths (3, 96, 96, 192, 384, 2208) at strides
    (1, 2, 4, 8, 16, 32).
    """

    dtype: jnp.dtype | None = None
    # opt-in blocked stem; measured no-win at the ResNet headline
    # (models/depth/resnet_dispnet.ResnetEncoder.stem_space_to_depth)
    stem_space_to_depth: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        feats = [x]
        out = TorchConv(DENSENET161_INIT, 7, stride=2, use_bias=False,
                        dtype=self.dtype,
                        space_to_depth=self.stem_space_to_depth)(x)
        out = nn.relu(_BN(eps=1e-5, momentum=0.1, dtype=self.dtype)(out, train))
        feats.append(out)  # relu0, H/2

        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats.append(out)  # pool0, H/4

        channels = DENSENET161_INIT
        for i, num_layers in enumerate(DENSENET161_BLOCKS):
            for _ in range(num_layers):
                out = DenseLayer(DENSENET161_GROWTH, dtype=self.dtype)(out, train)
            channels += num_layers * DENSENET161_GROWTH
            if i < 3:
                # transition: BN-ReLU-1x1(ch/2)-avgpool2
                out = nn.relu(
                    _BN(eps=1e-5, momentum=0.1, dtype=self.dtype)(out, train)
                )
                channels //= 2
                out = TorchConv(channels, 1, use_bias=False, dtype=self.dtype)(out)
                out = nn.avg_pool(out, (2, 2), strides=(2, 2))
                if i < 2:
                    feats.append(out)  # transition1 (H/8), transition2 (H/16)
        out = _BN(eps=1e-5, momentum=0.1, dtype=self.dtype)(out, train)  # norm5
        feats.append(out)  # H/32, pre-relu (relu applied by the decoder)
        return feats


class AtrousConv(nn.Module):
    """[BN] -> ReLU -> 1x1(2c) -> BN -> ReLU -> 3x3 dilated(c).

    Parity: model.py:21-36."""

    features: int
    dilation: int
    apply_bn_first: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.apply_bn_first:
            x = _BN(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = TorchConv(self.features * 2, 1, use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(_BN(momentum=0.01, eps=1e-5, dtype=self.dtype)(x, train))
        d = self.dilation
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=((d, d), (d, d)),
            kernel_dilation=(d, d),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        return x


class UpConv(nn.Module):
    """nearest 2x upsample -> 3x3 conv -> ELU. Parity: model.py:39-50."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = upsample2x_nearest(x)
        x = TorchConv(self.features, 3, use_bias=False, dtype=self.dtype)(x)
        return nn.elu(x)


class Reduction1x1(nn.Module):
    """Cascade of 1x1+ELU reductions ending in plane parameters (theta,
    phi, dist) -> unit normal + distance, or a final sigmoid.

    Parity: model.py:53-92."""

    num_out_filters: int
    max_depth: float
    is_final: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        width = self.num_out_filters
        while width >= 4:
            if width < 8:
                if self.is_final:
                    x = nn.sigmoid(
                        TorchConv(1, 1, use_bias=False, dtype=self.dtype)(x)
                    )
                else:
                    x = TorchConv(3, 1, use_bias=False, dtype=self.dtype)(x)
                break
            x = nn.elu(TorchConv(width, 1, use_bias=False, dtype=self.dtype)(x))
            width //= 2
        if self.is_final:
            return x
        theta = nn.sigmoid(x[..., 0]) * (math.pi / 3)
        phi = nn.sigmoid(x[..., 1]) * (math.pi * 2)
        dist = nn.sigmoid(x[..., 2]) * self.max_depth
        n1 = jnp.sin(theta) * jnp.cos(phi)
        n2 = jnp.sin(theta) * jnp.sin(phi)
        n3 = jnp.cos(theta)
        return jnp.stack([n1, n2, n3, dist], axis=-1)


def local_planar_guidance(plane_eq: jnp.ndarray, upratio: int) -> jnp.ndarray:
    """Expand coarse plane equations to full-resolution depth.

    depth(u, v) = n4 / (n1*u + n2*v + n3) with (u, v) the sub-pixel offsets
    of each fine pixel inside its coarse cell, in (-0.5, 0.5)/... units.
    Parity: model.py:94-116 (including the (x - (r-1)/2)/r offset).

    Args:
      plane_eq: [B, h, w, 4].
    Returns:
      [B, h*r, w*r] depth.
    """
    batch, height, width, _ = plane_eq.shape
    r = upratio
    # repeat_interleave on both spatial dims
    exp = jnp.broadcast_to(
        plane_eq[:, :, None, :, None, :], (batch, height, r, width, r, 4)
    ).reshape(batch, height * r, width * r, 4)
    offsets = (jnp.arange(r, dtype=plane_eq.dtype) - (r - 1) * 0.5) / r
    u = jnp.tile(offsets, width)[None, None, :]
    v = jnp.tile(offsets, height)[None, :, None]
    denom = exp[..., 0] * u + exp[..., 1] * v + exp[..., 2]
    return exp[..., 3] / denom


class BtsDecoder(nn.Module):
    """BTS decoder: upconv ladder + dilated ASPP + LPG heads.

    Parity: model.py:118-237."""

    num_features: int = 512
    max_depth: float = 80.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], focal=None,
                 train: bool = False):
        nf = self.num_features
        skip0, skip1, skip2, skip3 = features[1], features[2], features[3], features[4]
        dense_features = nn.relu(features[5])

        up5 = UpConv(nf, dtype=self.dtype)(dense_features)  # H/16
        up5 = _BN(dtype=self.dtype)(up5, train)
        iconv5 = nn.elu(
            TorchConv(nf, 3, use_bias=False, dtype=self.dtype)(
                jnp.concatenate([up5, skip3], -1)
            )
        )

        up4 = UpConv(nf // 2, dtype=self.dtype)(iconv5)  # H/8
        up4 = _BN(dtype=self.dtype)(up4, train)
        concat4 = jnp.concatenate([up4, skip2], -1)
        iconv4 = nn.elu(
            TorchConv(nf // 2, 3, use_bias=False, dtype=self.dtype)(concat4)
        )
        iconv4 = _BN(dtype=self.dtype)(iconv4, train)

        daspp_3 = AtrousConv(nf // 4, 3, apply_bn_first=False,
                             dtype=self.dtype)(iconv4, train)
        concat4_2 = jnp.concatenate([concat4, daspp_3], -1)
        daspp_6 = AtrousConv(nf // 4, 6, dtype=self.dtype)(concat4_2, train)
        concat4_3 = jnp.concatenate([concat4_2, daspp_6], -1)
        daspp_12 = AtrousConv(nf // 4, 12, dtype=self.dtype)(concat4_3, train)
        concat4_4 = jnp.concatenate([concat4_3, daspp_12], -1)
        daspp_18 = AtrousConv(nf // 4, 18, dtype=self.dtype)(concat4_4, train)
        concat4_5 = jnp.concatenate([concat4_4, daspp_18], -1)
        daspp_24 = AtrousConv(nf // 4, 24, dtype=self.dtype)(concat4_5, train)
        concat_daspp = jnp.concatenate(
            [iconv4, daspp_3, daspp_6, daspp_12, daspp_18, daspp_24], -1
        )
        daspp_feat = nn.elu(
            TorchConv(nf // 4, 3, use_bias=False, dtype=self.dtype)(concat_daspp)
        )

        def plane_head(feat, out_filters, upratio):
            eq = Reduction1x1(out_filters, self.max_depth, dtype=self.dtype)(feat)
            normal = eq[..., :3]
            normal = normal / jnp.linalg.norm(
                normal, axis=-1, keepdims=True
            ).clip(1e-12)
            eq = jnp.concatenate([normal, eq[..., 3:]], -1)
            depth = local_planar_guidance(eq, upratio)
            return depth[..., None] / self.max_depth  # [B, H, W, 1] scaled

        depth_8x8 = plane_head(daspp_feat, nf // 4, 8)  # full res
        d8_ds = resize_nearest(
            depth_8x8, depth_8x8.shape[1] // 4, depth_8x8.shape[2] // 4
        )

        up3 = UpConv(nf // 4, dtype=self.dtype)(daspp_feat)  # H/4
        up3 = _BN(dtype=self.dtype)(up3, train)
        iconv3 = nn.elu(
            TorchConv(nf // 4, 3, use_bias=False, dtype=self.dtype)(
                jnp.concatenate([up3, skip1, d8_ds], -1)
            )
        )

        depth_4x4 = plane_head(iconv3, nf // 8, 4)
        d4_ds = resize_nearest(
            depth_4x4, depth_4x4.shape[1] // 2, depth_4x4.shape[2] // 2
        )

        up2 = UpConv(nf // 8, dtype=self.dtype)(iconv3)  # H/2
        up2 = _BN(dtype=self.dtype)(up2, train)
        iconv2 = nn.elu(
            TorchConv(nf // 8, 3, use_bias=False, dtype=self.dtype)(
                jnp.concatenate([up2, skip0, d4_ds], -1)
            )
        )

        depth_2x2 = plane_head(iconv2, nf // 16, 2)

        up1 = UpConv(nf // 16, dtype=self.dtype)(iconv2)  # H
        reduc1x1 = Reduction1x1(
            nf // 32, self.max_depth, is_final=True, dtype=self.dtype
        )(up1)
        iconv1 = nn.elu(
            TorchConv(nf // 16, 3, use_bias=False, dtype=self.dtype)(
                jnp.concatenate(
                    [up1, reduc1x1, depth_2x2, depth_4x4, depth_8x8], -1
                )
            )
        )
        final_depth = self.max_depth * nn.sigmoid(
            TorchConv(1, 3, use_bias=False, dtype=self.dtype)(iconv1)
        )
        return depth_8x8, depth_4x4, depth_2x2, reduc1x1, final_depth


class BtsModel(nn.Module):
    """DenseNet-161 encoder + BTS decoder. Parity: model.py:263-272."""

    num_features: int = 512
    max_depth: float = 80.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, focal=None, train: bool = False):
        feats = DenseNet161Encoder(dtype=self.dtype)(x, train=train)
        return BtsDecoder(
            self.num_features, self.max_depth, dtype=self.dtype
        )(feats, focal, train=train)
