"""Bilinear resampling primitives (NHWC, shape-static, XLA-gather based).

JAX has no built-in equivalent of torch.nn.functional.grid_sample; this
module provides one with exactly the semantics the reference warp relies on
(bilinear, zeros padding, align_corners=True —
/root/reference/geometry/pose_geometry.py:227) plus the interpolation
helpers used by the model decoders and loss pyramid
(/root/reference/models/layers.py:55-58, /root/reference/losses.py:214-215).

Design notes (TPU): the sampler lowers to a single batched XLA gather over
the flattened H*W axis plus fused VPU arithmetic for the corner weights.
Gathers run on the scalar/vector units, not the MXU, but the op is
bandwidth-bound anyway; keeping it as one gather (4 taps folded into one
indexed lookup each) lets XLA fuse the weighting and the downstream
photometric L1/SSIM into the same loop nest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_pixels(img: jax.Array, ix: jax.Array, iy: jax.Array) -> jax.Array:
    """Gather img[b, iy, ix, :] for integer index maps.

    Args:
      img: [B, H, W, C].
      ix, iy: [B, Ho, Wo] int32, assumed in-range (callers clip).
    Returns:
      [B, Ho, Wo, C].
    """
    batch, height, width, channels = img.shape
    _, out_h, out_w = ix.shape
    flat = img.reshape(batch, height * width, channels)
    idx = (iy * width + ix).reshape(batch, out_h * out_w, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(batch, out_h, out_w, channels)


def _bilinear(
    img: jax.Array,
    x: jax.Array,
    y: jax.Array,
    zero_pad: bool,
) -> jax.Array:
    """Shared bilinear kernel over unnormalized pixel coordinates.

    Args:
      img: [B, H, W, C].
      x, y: [B, Ho, Wo] float sample locations in pixel units.
      zero_pad: if True, out-of-bounds taps contribute 0 (grid_sample
        padding_mode='zeros'); if False, taps are clamped to the border
        (interpolate semantics).
    """
    batch, height, width, _ = img.shape
    dtype = img.dtype

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = (x - x0f).astype(dtype)[..., None]
    wy1 = (y - y0f).astype(dtype)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def tap(ix, iy):
        cx = jnp.clip(ix, 0, width - 1)
        cy = jnp.clip(iy, 0, height - 1)
        val = _gather_pixels(img, cx, cy)
        if zero_pad:
            inb = (
                (ix >= 0) & (ix <= width - 1) & (iy >= 0) & (iy <= height - 1)
            )
            val = val * inb[..., None].astype(dtype)
        return val

    return (
        tap(x0, y0) * wx0 * wy0
        + tap(x1, y0) * wx1 * wy0
        + tap(x0, y1) * wx0 * wy1
        + tap(x1, y1) * wx1 * wy1
    )


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    align_corners: bool = True,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Bilinear sampling of img at normalized grid locations.

    Semantics match torch.nn.functional.grid_sample(mode='bilinear') for
    the (align_corners=True, padding_mode='zeros') configuration the
    reference warp uses (/root/reference/geometry/pose_geometry.py:227).

    Args:
      img: [B, H, W, C] source image (NHWC — note the reference is NCHW).
      grid: [B, Ho, Wo, 2] normalized (x, y) in [-1, 1].
      align_corners: coordinate convention; True maps -1 -> 0 and
        +1 -> size-1 exactly.
      padding_mode: 'zeros' or 'border'.
    Returns:
      [B, Ho, Wo, C] sampled image.
    """
    batch, height, width, _ = img.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        x = (gx + 1.0) * 0.5 * (width - 1)
        y = (gy + 1.0) * 0.5 * (height - 1)
    else:
        x = ((gx + 1.0) * width - 1.0) * 0.5
        y = ((gy + 1.0) * height - 1.0) * 0.5
    if padding_mode == "zeros":
        zero_pad = True
    elif padding_mode == "border":
        zero_pad = False
    else:
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")
    return _bilinear(img, x, y, zero_pad=zero_pad)


def resize_bilinear(
    img: jax.Array, out_h: int, out_w: int, align_corners: bool = False
) -> jax.Array:
    """Bilinear resize with torch.nn.functional.interpolate semantics.

    align_corners=False uses half-pixel centers with border clamping —
    the convention of the loss-pyramid upsample
    (/root/reference/losses.py:214-215) and the DispNetS skip upsample
    (/root/reference/models/depth/disp_net.py:124).
    """
    batch, height, width, _ = img.shape
    if (out_h, out_w) == (height, width):
        return img
    ho = jnp.arange(out_h, dtype=jnp.float32)
    wo = jnp.arange(out_w, dtype=jnp.float32)
    if align_corners:
        y = ho * ((height - 1) / max(out_h - 1, 1))
        x = wo * ((width - 1) / max(out_w - 1, 1))
    else:
        y = jnp.clip((ho + 0.5) * (height / out_h) - 0.5, 0.0, None)
        x = jnp.clip((wo + 0.5) * (width / out_w) - 0.5, 0.0, None)
    xx = jnp.broadcast_to(x[None, None, :], (batch, out_h, out_w))
    yy = jnp.broadcast_to(y[None, :, None], (batch, out_h, out_w))
    return _bilinear(img, xx, yy, zero_pad=False)


def resize_nearest(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize (torch interpolate mode='nearest': floor of
    the source index)."""
    batch, height, width, _ = img.shape
    y = jnp.floor(jnp.arange(out_h, dtype=jnp.float32) * (height / out_h))
    x = jnp.floor(jnp.arange(out_w, dtype=jnp.float32) * (width / out_w))
    iy = jnp.clip(y.astype(jnp.int32), 0, height - 1)
    ix = jnp.clip(x.astype(jnp.int32), 0, width - 1)
    return img[:, iy][:, :, ix]


def upsample2x_nearest(img: jax.Array) -> jax.Array:
    """2x nearest upsample — each pixel repeated 2x2.

    Parity: /root/reference/models/layers.py:55-58 (decoder upsample);
    expressed as reshape/broadcast (no gather) so XLA fuses it into the
    surrounding convolutions.
    """
    batch, height, width, channels = img.shape
    img = jnp.broadcast_to(
        img[:, :, None, :, None, :],
        (batch, height, 2, width, 2, channels),
    )
    return img.reshape(batch, height * 2, width * 2, channels)
