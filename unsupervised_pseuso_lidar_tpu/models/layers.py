"""Shared conv building blocks (Flax linen, NHWC).

Capability parity with /root/reference/models/layers.py:10-58 (ConvBlock,
Conv3x3 with reflection padding, nearest upsample) plus torch-compatible
conv/conv-transpose wrappers used across the model zoo.

Padding semantics: torch Conv2d pads symmetrically by (k-1)//2; XLA 'SAME'
pads asymmetrically for stride 2, which samples different positions. Every
strided conv here uses explicit torch-style padding so imported PyTorch
checkpoints (sfm.pth-style state dicts, SURVEY.md §7 risk list) reproduce
activations exactly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from unsupervised_pseuso_lidar_tpu.ops.resample import reflect_pad1  # noqa: F401 (re-export)


def torch_padding(kernel_size: int) -> Sequence[tuple]:
    pad = (kernel_size - 1) // 2
    return ((pad, pad), (pad, pad))


# ---------------------------------------------------------------------------
# torch-parity initialization
#
# torch Conv2d/ConvTranspose2d reset_parameters draws BOTH the kernel and
# the bias from U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with
# a=sqrt(5)). This is NOT a style choice here but a training-dynamics
# requirement: the monodepth2-style decoder has no normalization layers,
# so the init scale compounds multiplicatively across its ~15 convs. With
# he_normal (std sqrt(2/fan_in), 2.4x torch's) the dispconv logits land
# several sigmas from 0 and the disparity sigmoid SATURATES AT INIT
# (measured on benchmarks/diag_refloop.py: sigma_mean 0.997 at step 1,
# 1.000 by step 50 -> constant 0.1 m depth, zero sigmoid gradient, eval
# exactly at the constant-prediction floor — the r3 REFLOOP collapse).
# Matching the reference's init distribution (the torch default the
# reference trains from, /root/reference/models/depth/resnet_dispnet.py
# declares no custom init) starts sigma near 0.5 with healthy gradients.
# ---------------------------------------------------------------------------


def torch_kernel_init():
    """torch's default conv kernel init: U(+-1/sqrt(fan_in)) ==
    variance_scaling(1/3, fan_in, uniform) for [k, k, cin, cout] kernels."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


def torch_bias_init(fan_in: int):
    """torch's default conv bias init: U(+-1/sqrt(fan_in))."""
    return _uniform_bound(float(fan_in) ** -0.5)


class TorchConv(nn.Module):
    """Conv2d with torch-style symmetric padding (NHWC).

    space_to_depth: rewrite an odd-k stride-2 conv as a ((k+1)/2)-tap
    stride-1 conv over the 2x2-space-to-depth-blocked input — the MLPerf
    ResNet TPU stem trick. A 7x7/s2 conv on a 3-channel image fills 3 of
    the MXU's 128 input lanes; the blocked form runs the SAME MACs with
    12 input lanes at 1/4 the spatial positions, so XLA tiles it ~4x
    denser. The parameter stays the torch-shaped [k, k, cin, features]
    kernel under the usual Conv_0 path (checkpoint-compatible both ways);
    the blocked kernel is a zero-padded reshuffle computed at apply time.
    Falls back to the plain conv at odd H/W (e.g. raw KITTI 1242x375)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    space_to_depth: bool = False
    # None = torch's default conv init (see torch_kernel_init above —
    # load-bearing for from-scratch training); models with an explicit
    # reference init scheme override (PoseNet: xavier + zero bias,
    # /root/reference/models/pose/pose_net.py:51-56)
    kernel_init: nn.initializers.Initializer | None = None
    bias_init: nn.initializers.Initializer | None = None

    @nn.compact
    def __call__(self, x):
        if (
            self.space_to_depth
            and self.stride == 2
            and self.kernel_size % 2 == 1
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            return self._s2d_conv(x)
        fan_in = self.kernel_size * self.kernel_size * x.shape[-1]
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=torch_padding(self.kernel_size),
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init or torch_kernel_init(),
            bias_init=self.bias_init or torch_bias_init(fan_in),
        )(x)

    def _s2d_conv(self, x):
        batch, height, width, cin = x.shape
        k = self.kernel_size
        kernel, bias = _ConvParams(
            self.features, cin, kernel_size=k, use_bias=self.use_bias,
            kernel_init=self.kernel_init, bias_init=self.bias_init,
            name="Conv_0",
        )()
        dtype = self.dtype or x.dtype

        # input: [B, H, W, C] -> [B, H/2, W/2, 4C], channel order (a, b, c)
        xb = (
            x.reshape(batch, height // 2, 2, width // 2, 2, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(batch, height // 2, width // 2, 4 * cin)
        )
        # kernel: output row r = 2i + (dy - pad) lands on block row
        # p = i + P - pad_blk with phase a = r mod 2, i.e. dy = 2P + a - 1
        # after one leading zero row/col pad (k odd -> k+1 even). Same
        # reshuffle along columns. [k,k,ci,co] -> [(k+1)/2 * 2, ...] ->
        # [(k+1)/2, (k+1)/2, 4ci, co] with (a, b, c)-major channel order
        # matching xb.
        kb = k + 1
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kb_kernel = (
            kp.reshape(kb // 2, 2, kb // 2, 2, cin, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(kb // 2, kb // 2, 4 * cin, self.features)
        )
        pad = (k - 1) // 2  # torch pad; block pads: lo=(pad+1)//2, hi=pad//2
        out = jax.lax.conv_general_dilated(
            xb.astype(dtype),
            kb_kernel.astype(dtype),
            window_strides=(1, 1),
            padding=(((pad + 1) // 2, pad // 2), ((pad + 1) // 2, pad // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            out = out + bias.astype(dtype)
        return out


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(kernel, stride=2, padding=1, output_padding=1) —
    exact torch semantics (output = 2x input size).

    Implemented as an input-dilated convolution with a spatially flipped
    kernel: y = conv(dilate(x, 2), flip(W)), pad (k-1-p, k-1-p+op). This is
    the algebraic definition of torch's transposed conv, expressed in a
    form XLA lowers straight onto the MXU.

    Parity: /root/reference/models/depth/disp_net.py:39-43 and
    /root/reference/models/depth/stn_depth_net.py:24-29 (without norm).
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k = self.kernel_size
        # torch ConvTranspose2d fan_in is size(1)*k*k of its [cin, cout,
        # k, k] weight = cout*k*k (NOT cin) — both kernel and bias draw
        # U(+-1/sqrt(fan_in)), matched here (see torch_kernel_init note)
        fan_in = k * k * self.features
        kernel = self.param(
            "kernel",
            _uniform_bound(float(fan_in) ** -0.5),
            (k, k, in_features, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        pad_lo = k - 1 - self.padding
        pad_hi = k - 1 - self.padding + self.output_padding
        out = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel[::-1, ::-1, :, :].astype(dtype),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(fan_in), (self.features,),
                jnp.float32,
            )
            out = out + bias.astype(dtype)
        return out


class _ConvParams(nn.Module):
    """Bare conv parameters under the same scope/leaf names as nn.Conv,
    so modules that need raw kernel access (the fused upsample+conv and
    space-to-depth stem paths) stay checkpoint-path-compatible with the
    nn.Conv they replace (train/checkpoint.py maps .../Conv_0/{kernel,bias})."""

    features: int
    in_features: int
    kernel_size: int = 3
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer | None = None
    bias_init: nn.initializers.Initializer | None = None

    @nn.compact
    def __call__(self):
        fan_in = self.kernel_size * self.kernel_size * self.in_features
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_kernel_init(),
            (self.kernel_size, self.kernel_size, self.in_features,
             self.features),
            jnp.float32,
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param(
            "bias", self.bias_init or torch_bias_init(fan_in),
            (self.features,), jnp.float32,
        )
        return kernel, bias


def s2d_interleave(x4: jax.Array, co: int) -> jax.Array:
    """Phase-domain [B, h, w, 4co] (channel groups (a, b)-major: group
    p = 2a + b holds full-res pixel (2y+a, 2x+b)) -> full-res
    [B, 2h, 2w, co] depth-to-space."""
    batch, h, w, _ = x4.shape
    return (
        x4.reshape(batch, h, w, 2, 2, co)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(batch, 2 * h, 2 * w, co)
    )


def s2d_block(x: jax.Array) -> jax.Array:
    """Full-res [B, 2h, 2w, c] -> phase-domain [B, h, w, 4c], channel
    groups (a, b)-major (inverse of s2d_interleave)."""
    batch, height, width, c = x.shape
    return (
        x.reshape(batch, height // 2, 2, width // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(batch, height // 2, width // 2, 4 * c)
    )


def _s2d_ring_update(
    out4: jax.Array,
    co: int,
    top: jax.Array,
    bottom: jax.Array,
    left: jax.Array,
    right: jax.Array,
) -> jax.Array:
    """Write full-res border strips into a phase-domain tensor.

    out4: [B, h, w, 4co] phase-major (group p = 2a + b). top/bottom:
    [B, 1, 2w, co] full-res rows 0 / 2h-1 (phases a=0 / a=1). left/right:
    [B, 2h, 1, co] full-res cols 0 / 2w-1 (phases b=0 / b=1). Write order
    top, bottom, left, right — the column strips win the corners, exactly
    like the full-res dynamic_update_slice sequence they replace."""
    batch, h, w, _ = out4.shape
    row = lambda s: s.reshape(batch, 1, w, 2 * co)
    out4 = out4.at[:, :1, :, 0 : 2 * co].set(row(top))
    out4 = out4.at[:, -1:, :, 2 * co : 4 * co].set(row(bottom))
    lcol = left.reshape(batch, h, 2, 1, co)
    out4 = out4.at[:, :, :1, 0:co].set(lcol[:, :, 0])
    out4 = out4.at[:, :, :1, 2 * co : 3 * co].set(lcol[:, :, 1])
    rcol = right.reshape(batch, h, 2, 1, co)
    out4 = out4.at[:, :, -1:, co : 2 * co].set(rcol[:, :, 0])
    out4 = out4.at[:, :, -1:, 3 * co : 4 * co].set(rcol[:, :, 1])
    return out4


def _s2d_full3x3_kernel(w: jax.Array) -> jax.Array:
    """Express a FULL-RES 3x3/s1 conv as a phase-domain conv over
    space-to-depth input: [3, 3, ci, co] -> [3, 3, 4ci, 4co].

    out_s2d[y, x, (a,b), o] = full-res out[2y+a, 2x+b, o]; input phase
    group (py, px) of block (y+P-1, x+Q-1) holds full-res pixel
    (2(y+P-1)+py, 2(x+Q-1)+px), which is conv tap (dy, dx) =
    (2P+py-a-1, 2Q+px-b-1) of output pixel (2y+a, 2x+b). Taps outside
    [0, 3) are structural zeros (each output phase uses 9 of the 36
    (P, Q, phase) combos). Same math as the full-res conv with ZERO
    padding; the reflect border ring is fixed separately."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4, ci, 4, co), w.dtype)
    for pos in range(3):
        for py in range(2):
            for a in range(2):
                dy = 2 * pos + py - a - 1
                if not 0 <= dy < 3:
                    continue
                for q in range(3):
                    for px in range(2):
                        for b in range(2):
                            dx = 2 * q + px - b - 1
                            if not 0 <= dx < 3:
                                continue
                            out = out.at[pos, q, 2 * py + px, :, 2 * a + b, :].set(
                                w[dy, dx]
                            )
    return out.reshape(3, 3, 4 * ci, 4 * co)


def _up2_phase_kernel(w: jax.Array) -> jax.Array:
    """Collapse conv3x3 ∘ nearest-up2 into one half-res conv kernel.

    Nearest upsampling duplicates source pixels, so the 3 conv taps of an
    output row 2i+a land on just TWO source rows with pre-summed weights:
    a=0 -> rows (i-1: w0, i: w1+w2); a=1 -> rows (i: w0+w1, i+1: w2) —
    and likewise along columns. Embedding each phase's 2x2 collapsed
    kernel into the shared 3x3 window over source pixels gives one conv
    with 4x the output channels at HALF resolution, followed by
    depth-to-space. w: [3, 3, ci, co] -> [3, 3, ci, 4*co] with phase
    order (a, b) major."""
    rows = {
        0: ((0, w[0]), (1, w[1] + w[2])),
        1: ((1, w[0] + w[1]), (2, w[2])),
    }
    phases = []
    for a in (0, 1):
        r = jnp.zeros_like(w)
        for slot, wk in rows[a]:
            r = r.at[slot].set(wk)
        cols = {
            0: ((0, r[:, 0]), (1, r[:, 1] + r[:, 2])),
            1: ((1, r[:, 0] + r[:, 1]), (2, r[:, 2])),
        }
        for b in (0, 1):
            c = jnp.zeros_like(r)
            for slot, wk in cols[b]:
                c = c.at[:, slot].set(wk)
            phases.append(c)
    return jnp.concatenate(phases, axis=-1)


class Conv3x3(nn.Module):
    """Reflection-pad-1 + 3x3 conv.

    Parity: /root/reference/models/layers.py:37-52.

    TPU formulation: reflection differs from zero padding only on the
    1-pixel output border, so the bulk runs as ONE conv with fused zero
    padding (no materialized [B, H+2, W+2, C] tensor — at the decoder's
    full-res level those pads plus their layout copies were ~10 ms of the
    b12 train step, 100x the conv's own FLOPs) and the border ring is
    recomputed exactly from reflect-padded 2-row/2-column strips with the
    same kernel, written back via thin dynamic-update-slices. Identical
    math: every output pixel is the same 3x3 MAC over the same values.

    pre_upsample2x: compute conv3x3(upsample2x_nearest(x)) from the
    HALF-resolution input in one fused half-res conv with 4 phase-channel
    groups + depth-to-space (see _up2_phase_kernel) — the upsampled
    tensor never materializes, the conv runs at 1/4 the positions with
    4x the output lanes (C=64 instead of 16 at the decoder tail), and the
    per-phase weight pre-sums mean fewer FLOPs than the full-res conv.
    Same math modulo float reassociation; border ring recomputed exactly
    as above from upsampled edge strips. Parameters live under Conv_0
    exactly like the unfused path, so checkpoints are interchangeable."""

    features: int
    use_refl: bool = True
    pre_upsample2x: bool = False
    # emit_s2d (with pre_upsample2x): return the PHASE-DOMAIN result
    # [B, h, w, 4co] instead of interleaving to [B, 2h, 2w, co]. At the
    # decoder's full-res tail XLA lays [24, 192, 640, 16] out batch-minor
    # (24 lanes of 128 used -> 5.3x physical inflation); keeping the tail
    # in the compact phase domain removed ~6 ms of the b12 640x192 train
    # step (elementwise ops, depth-to-space copies, and the co1 head's
    # backward all shrink — benchmarks/conv_diag.py, r5).
    emit_s2d: bool = False
    # s2d_domain: consume AND produce phase-domain tensors — the same
    # full-res 3x3 reflect-pad conv computed without ever materializing
    # the full-res activation (kernel: _s2d_full3x3_kernel).
    s2d_domain: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        if self.s2d_domain:
            return self._s2d_domain_conv(x)
        if self.pre_upsample2x:
            return self._up2_fused(x)
        conv = nn.Conv(
            self.features,
            (3, 3),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=torch_kernel_init(),
            bias_init=torch_bias_init(9 * x.shape[-1]),
        )
        if not self.use_refl:
            return conv(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
        height, width = x.shape[1], x.shape[2]
        if height < 3 or width < 3:
            return conv(reflect_pad1(x))
        # zero-pad conv over the full image (border ring wrong, fixed
        # below); XLA folds the constant zero pad into the convolution's
        # window padding, so nothing materializes
        full = conv(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
        top = conv(reflect_pad1(x[:, :2]))[:, :1]
        bottom = conv(reflect_pad1(x[:, -2:]))[:, -1:]
        left = conv(reflect_pad1(x[:, :, :2]))[:, :, :1]
        right = conv(reflect_pad1(x[:, :, -2:]))[:, :, -1:]
        full = jax.lax.dynamic_update_slice_in_dim(full, top, 0, axis=1)
        full = jax.lax.dynamic_update_slice_in_dim(full, bottom, height - 1, axis=1)
        full = jax.lax.dynamic_update_slice_in_dim(full, left, 0, axis=2)
        return jax.lax.dynamic_update_slice_in_dim(full, right, width - 1, axis=2)

    def _up2_fused(self, x):
        if not self.use_refl:
            raise NotImplementedError("pre_upsample2x requires use_refl")
        batch, height, width, cin = x.shape
        kernel, bias = _ConvParams(self.features, cin, name="Conv_0")()
        dtype = self.dtype or x.dtype
        co = self.features

        # bulk: one half-res conv, zero pad (ring fixed below)
        pk = _up2_phase_kernel(kernel).astype(dtype)
        out4 = jax.lax.conv_general_dilated(
            x.astype(dtype), pk,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [B, h, w, 4co], phase (a, b) major

        # border ring: exact reflect-pad values from upsampled edge strips
        k = kernel.astype(dtype)

        def conv_strip(strip):
            out = jax.lax.conv_general_dilated(
                strip.astype(dtype), k,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out + bias.astype(dtype)

        def up2(a):
            a = jnp.repeat(a, 2, axis=1)
            return jnp.repeat(a, 2, axis=2)

        top = conv_strip(reflect_pad1(up2(x[:, :1])))[:, :1]
        bottom = conv_strip(reflect_pad1(up2(x[:, -1:])))[:, -1:]
        left = conv_strip(reflect_pad1(up2(x[:, :, :1])))[:, :, :1]
        right = conv_strip(reflect_pad1(up2(x[:, :, -1:])))[:, :, -1:]

        if self.emit_s2d:
            out4 = out4 + jnp.tile(bias, 4).astype(dtype)
            return _s2d_ring_update(out4, co, top, bottom, left, right)

        full = (
            out4.reshape(batch, height, width, 2, 2, co)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(batch, 2 * height, 2 * width, co)
        )
        full = full + bias.astype(dtype)
        full = jax.lax.dynamic_update_slice_in_dim(full, top, 0, axis=1)
        full = jax.lax.dynamic_update_slice_in_dim(
            full, bottom, 2 * height - 1, axis=1
        )
        full = jax.lax.dynamic_update_slice_in_dim(full, left, 0, axis=2)
        return jax.lax.dynamic_update_slice_in_dim(
            full, right, 2 * width - 1, axis=2
        )

    def _s2d_domain_conv(self, x4):
        """Phase-domain [B, h, w, 4ci] -> [B, h, w, 4co]: the full-res
        3x3/s1 reflect-pad conv without materializing full res (bulk via
        _s2d_full3x3_kernel zero-pad conv; reflect ring recomputed
        exactly from interleaved edge strips)."""
        ci = x4.shape[-1] // 4
        co = self.features
        kernel, bias = _ConvParams(co, ci, name="Conv_0")()
        dtype = self.dtype or x4.dtype
        ks = _s2d_full3x3_kernel(kernel).astype(dtype)
        out4 = jax.lax.conv_general_dilated(
            x4.astype(dtype), ks,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.tile(bias, 4).astype(dtype)
        if not self.use_refl:
            return out4

        k = kernel.astype(dtype)

        def conv_strip(strip):
            out = jax.lax.conv_general_dilated(
                strip.astype(dtype), k,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out + bias.astype(dtype)

        top = conv_strip(reflect_pad1(s2d_interleave(x4[:, :1], ci)))[:, :1]
        bottom = conv_strip(
            reflect_pad1(s2d_interleave(x4[:, -1:], ci))
        )[:, -1:]
        left = conv_strip(
            reflect_pad1(s2d_interleave(x4[:, :, :1], ci))
        )[:, :, :1]
        right = conv_strip(
            reflect_pad1(s2d_interleave(x4[:, :, -1:], ci))
        )[:, :, -1:]
        return _s2d_ring_update(out4, co, top, bottom, left, right)


class ConvBlock(nn.Module):
    """Conv3x3 (reflect pad) + ELU.

    Parity: /root/reference/models/layers.py:22-34.

    pre_upsample2x: fuse a preceding nearest 2x upsample into the conv
    (see Conv3x3.pre_upsample2x) — same parameters, same math."""

    features: int
    pre_upsample2x: bool = False
    emit_s2d: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        # ELU is elementwise, so it commutes with depth-to-space: applying
        # it in the phase domain (emit_s2d) is exact.
        return nn.elu(
            Conv3x3(
                self.features,
                pre_upsample2x=self.pre_upsample2x,
                emit_s2d=self.emit_s2d,
                dtype=self.dtype,
            )(x)
        )


class DownsampleConvBN(nn.Module):
    """Conv(s2) + ReLU + BatchNorm + Conv(s1) + ReLU — the (quirky: norm
    after the activation) DispNetS encoder block.

    Parity: /root/reference/models/depth/disp_net.py:15-22."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = TorchConv(
            self.features, self.kernel_size, stride=2, dtype=self.dtype
        )(x)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        x = TorchConv(self.features, self.kernel_size, dtype=self.dtype)(x)
        return nn.relu(x)


class DownsampleConvGN(nn.Module):
    """Conv(s2) + GroupNorm(16) + ReLU + Conv(s1) + GroupNorm(16) + ReLU.

    Parity: /root/reference/models/depth/stn_depth_net.py:8-16."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = TorchConv(
            self.features, self.kernel_size, stride=2, dtype=self.dtype
        )(x)
        x = nn.relu(nn.GroupNorm(num_groups=16, dtype=self.dtype)(x))
        x = TorchConv(self.features, self.kernel_size, dtype=self.dtype)(x)
        return nn.relu(nn.GroupNorm(num_groups=16, dtype=self.dtype)(x))


class UpconvGN(nn.Module):
    """ConvTranspose(3, s2) + GroupNorm(16) + ReLU.

    Parity: /root/reference/models/depth/stn_depth_net.py:24-29."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = TorchConvTranspose(self.features, dtype=self.dtype)(x)
        return nn.relu(nn.GroupNorm(num_groups=16, dtype=self.dtype)(x))
