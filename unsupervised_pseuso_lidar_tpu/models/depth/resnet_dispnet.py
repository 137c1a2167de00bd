"""DispResNet — ResNet-18 encoder + multi-scale depth decoder (Flax, NHWC).

Capability parity with /root/reference/models/depth/resnet_dispnet.py:12-107
(torchvision resnet18 encoder + monodepth2 DepthDecoder, returning only the
scale-0 disparity). The ResNet is implemented natively in Flax with
torch-compatible padding so torchvision/sfm.pth checkpoints can be imported
weight-for-weight (see train/checkpoint.py).

This is the model of record — configs/basic_config.yaml selects DispResNet
(/root/reference/configs/basic_config.yaml:4-5).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_pseuso_lidar_tpu.models.layers import (
    Conv3x3,
    ConvBlock,
    TorchConv,
    s2d_interleave,
)
from unsupervised_pseuso_lidar_tpu.ops.resample import upsample2x_nearest

# torchvision's ResNet init (the encoder distribution the reference
# actually trains from scratch with, resnet 'kaiming_normal fan_out'):
# nn.init.kaiming_normal_(weight, mode='fan_out', nonlinearity='relu')
_RESNET_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

RESNET_STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
# depths built from Bottleneck blocks (x4 channel expansion) — the same
# five the reference's torchvision-backed encoder accepts
# (/root/reference/models/depth/resnet_dispnet.py:20-32)
BOTTLENECK_DEPTHS = frozenset({50, 101, 152})

# largest traced batch at which the space-to-depth decoder tail still
# wins (see DepthDecoder.s2d_tail: measured win at 24 and 32, loss at
# 64 — the batch-minor layout waste it removes shrinks as batch/128)
S2D_TAIL_MAX_BATCH = 32


class BasicBlock(nn.Module):
    """ResNet v1 basic block: 3x3 conv-bn-relu, 3x3 conv-bn, skip, relu."""

    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn():
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )

        residual = x
        out = TorchConv(self.features, 3, stride=self.stride, use_bias=False,
                        dtype=self.dtype, kernel_init=_RESNET_CONV_INIT)(x)
        out = nn.relu(bn()(out))
        out = TorchConv(self.features, 3, use_bias=False, dtype=self.dtype,
                        kernel_init=_RESNET_CONV_INIT)(out)
        out = bn()(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = TorchConv(
                self.features, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, kernel_init=_RESNET_CONV_INIT,
            )(x)
            residual = bn()(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """ResNet bottleneck block (torchvision v1.5 layout: stride on the
    3x3): 1x1 conv-bn-relu, 3x3 conv-bn-relu, 1x1 (4x width) conv-bn,
    projected skip, relu. Output channels = 4 * features."""

    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn():
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )

        out_ch = 4 * self.features
        residual = x
        out = TorchConv(self.features, 1, use_bias=False, dtype=self.dtype,
                        kernel_init=_RESNET_CONV_INIT)(x)
        out = nn.relu(bn()(out))
        out = TorchConv(self.features, 3, stride=self.stride, use_bias=False,
                        dtype=self.dtype, kernel_init=_RESNET_CONV_INIT)(out)
        out = nn.relu(bn()(out))
        out = TorchConv(out_ch, 1, use_bias=False, dtype=self.dtype,
                        kernel_init=_RESNET_CONV_INIT)(out)
        out = bn()(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = TorchConv(
                out_ch, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, kernel_init=_RESNET_CONV_INIT,
            )(x)
            residual = bn()(residual)
        return nn.relu(out + residual)


class ResnetEncoder(nn.Module):
    """ResNet feature-pyramid encoder.

    Returns the 5 feature maps the depth decoder consumes:
    [relu(bn(conv1)), layer1, layer2, layer3, layer4] with channel widths
    (64, 64, 128, 256, 512) for resnet18/34 and (64, 256, 512, 1024,
    2048) for the bottleneck depths 50/101/152 (the decoder adapts — its
    skip-concat channels come from the actual feature maps).
    Parity: /root/reference/models/depth/resnet_dispnet.py:12-46.
    """

    num_layers: int = 18
    dtype: jnp.dtype | None = None
    # Rewrite the 7x7/s2 stem as a 4x4/s1 conv over 2x2-blocked input
    # (models/layers.TorchConv). Measured on v5e at the b12 640x192 bf16
    # headline: 227.6 fps vs 229.8 plain — XLA already tiles the small-cin
    # stem at this net's ceiling, so the blocked form stays opt-in
    # (docs/PERFORMANCE.md §3). Checkpoint-identical either way.
    stem_space_to_depth: bool = False

    @property
    def num_ch_enc(self) -> Sequence[int]:
        if self.num_layers in BOTTLENECK_DEPTHS:
            return (64, 256, 512, 1024, 2048)
        return (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.num_layers not in RESNET_STAGE_BLOCKS:
            raise ValueError(f"{self.num_layers} is not a supported resnet depth")
        stage_blocks = RESNET_STAGE_BLOCKS[self.num_layers]
        block_cls = (
            Bottleneck if self.num_layers in BOTTLENECK_DEPTHS else BasicBlock
        )

        features = []
        out = TorchConv(64, 7, stride=2, use_bias=False, dtype=self.dtype,
                        space_to_depth=self.stem_space_to_depth,
                        kernel_init=_RESNET_CONV_INIT)(x)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(out)
        out = nn.relu(out)
        features.append(out)

        out = nn.max_pool(
            out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        for stage, num_blocks in enumerate(stage_blocks):
            width = 64 * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                out = block_cls(width, stride=stride, dtype=self.dtype)(
                    out, train=train
                )
            features.append(out)
        return features


class DepthDecoder(nn.Module):
    """monodepth2 decoder: nearest-upsample + skip-concat ConvBlocks with
    per-scale sigmoid disparity heads.

    Returns {scale: [B, H/2^s, W/2^s, 1]} for scale in `scales`.
    Parity: /root/reference/models/depth/resnet_dispnet.py:48-96.
    """

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    # Run the full-res tail (the i==0 ConvBlock + disp head) in the
    # space-to-depth phase domain [B, h, w, 4C] instead of materializing
    # [B, 2h, 2w, C]: XLA lays full-res 16-channel activations out
    # batch-minor (24 of 128 lanes used, 5.3x physical inflation), which
    # made the tail's elementwise ops + depth-to-space copies + co1 head
    # backward ~10 ms of the 53 ms b12 640x192 train step (r5 trace,
    # benchmarks/conv_diag.py). Exact same math (bias/ELU/sigmoid commute
    # with depth-to-space; conv via _s2d_full3x3_kernel + reflect ring),
    # identical parameters/checkpoint paths either way.
    #
    # BATCH-GATED at trace time: the layout pathology this fixes scales
    # as 128/batch, so the win inverts once the batch fills the lanes.
    # Measured (640x192 bf16 'mean' step, v5e): batch 24 -> s2d wins
    # (53.4 -> 44.8 ms), batch 32 -> wins (59.9 -> 50.6), batch 64 ->
    # LOSES (94.4 -> 145.5). The phase path therefore engages only when
    # the traced batch <= S2D_TAIL_MAX_BATCH.
    s2d_tail: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, input_features, image_shape=None):
        """`image_shape` = (H, W) of the ORIGINAL input image. At
        non-multiple-of-32 inputs the scale-i pyramid level should be
        ceil(H/2^i) x ceil(W/2^i); the upsampling chain can overshoot
        that by one row/col (2*ceil > ceil of the double), and without a
        skip to crop to (the i==0 head) the extrapolated edge would
        survive into the output and misalign the whole disparity map
        once the loss resizes it back to image dims. Passing the image
        shape crops every scale to its exact pyramid size."""
        num_ch_dec = (16, 32, 64, 128, 256)
        outputs = {}
        x = input_features[-1]
        # symbolic batch (jax_export batch polymorphism) is undecidable
        # against the threshold -> take the batch-agnostic plain path
        batch_dim = input_features[-1].shape[0]
        use_s2d_tail = (
            self.s2d_tail
            and isinstance(batch_dim, int)
            and batch_dim <= S2D_TAIL_MAX_BATCH
        )
        for i in range(4, -1, -1):
            s2d = use_s2d_tail and i == 0
            x = ConvBlock(num_ch_dec[i], dtype=self.dtype)(x)
            if self.use_skips and i > 0:
                x = upsample2x_nearest(x)
                skip = input_features[i - 1]
                # crop-to-skip: at non-multiple-of-32 inputs (e.g. the raw
                # KITTI 1242x375 geometry) the 2x upsample overshoots the
                # encoder skip by one row/col (skip = ceil(prev/2), so
                # 2*skip >= prev always); torch monodepth2 hard-fails
                # here — we crop, the DispNetS crop_like convention
                # (/root/reference/models/depth/disp_net.py:46-48)
                x = x[:, : skip.shape[1], : skip.shape[2], :]
                x = jnp.concatenate([x, skip], axis=-1)
                x = ConvBlock(num_ch_dec[i], dtype=self.dtype)(x)
            else:
                # no skip concat between upsample and conv: fuse the
                # upsample into the conv (half-res phase conv — the
                # full-res [B, 2h, 2w, C] activation never materializes;
                # identical parameters and math, models/layers.Conv3x3).
                # With s2d_tail the result STAYS in the phase domain.
                x = ConvBlock(
                    num_ch_dec[i], pre_upsample2x=True, emit_s2d=s2d,
                    dtype=self.dtype,
                )(x)
            if i in self.scales:
                head = Conv3x3(
                    self.num_output_channels, s2d_domain=s2d,
                    dtype=self.dtype,
                )(x)
                if s2d:
                    head = s2d_interleave(head, self.num_output_channels)
                disp = nn.sigmoid(head)
                if image_shape is not None:
                    h = -(-image_shape[0] // (2 ** i))  # ceil div
                    w = -(-image_shape[1] // (2 ** i))
                    disp = disp[:, :h, :w, :]
                outputs[i] = disp
        return outputs


class DispResNet(nn.Module):
    """Encoder+decoder; returns [disp0] only, like the reference
    (/root/reference/models/depth/resnet_dispnet.py:104-107)."""

    num_layers: int = 18
    scales: Sequence[int] = (0, 1, 2, 3)
    all_scales: bool = False
    s2d_tail: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        features = ResnetEncoder(self.num_layers, dtype=self.dtype)(
            x, train=train
        )
        outputs = DepthDecoder(
            scales=self.scales, s2d_tail=self.s2d_tail, dtype=self.dtype
        )(features, image_shape=x.shape[1:3])
        if self.all_scales:
            return [outputs[s] for s in sorted(outputs)]
        return [outputs[0]]
