"""Pallas TPU kernel: fused band-matmul bilinear warp (MXU grid_sample).

The XLA formulation (`ops.resample.grid_sample_mxu`) materializes the
2-sparse x-interpolation matrix in HBM — ~29 MB per row-block, ~5.7 GB of
write+read traffic per training step's warp volume, which bounds it at
~26 ms. This kernel builds each 128-pixel one-hot tile directly in VMEM
registers and feeds the MXU, so the only HBM traffic is the source image
planes (once per (batch, block) — the padded image fits in VMEM), the
per-pixel coordinates, and the output.

Layout: channel planes (+ one zero pad plane) are stacked along rows as
[B, 4*Hp, W] bf16 so the per-block band assembles into a [3K, W]
VMEM scratch and x-interpolation is ONE [128, W] x [W, 128] MXU dot per
tile (full 128-lane utilization). Per-pixel coords are pre-transposed to
[B, T, 128, NT] so a tile's coordinate vector reads as a [128, 1] sublane
column — no in-kernel relayouts.

Gradients: training only needs d(out)/d(grid) (the warped sources are
data, not activations — /root/reference/trainer.py:296-306 warps the
reference frames). The custom VJP computes the per-pixel d(out)/dx and
d(out)/dy tap planes INSIDE the forward kernel (pure 0/1 indicator
one-hots + one [3KW, WB] x [WB, 256] two-tap MXU dot per tile; bilinear
weights applied post-dot in f32), so the backward pass is two fused
elementwise contractions with the output cotangent — no backward kernel,
no second coordinate _prepare, no one-hot rebuild. It returns a ZERO
gradient for the image. Semantics otherwise match
grid_sample_mxu(band_pad, rows_per_block=8, dot_dtype=bf16): flow-adaptive
vertical band, zeros padding, out-of-band taps contribute 0.

Column banding (the horizontal analog of the vertical band): the
x-interpolation dot contracts over the full image width, so its FLOPs —
the kernel's dominant cost, already ~70% MXU-efficient — scale with W.
For lane-aligned widths >= 512 each 128-pixel coordinate tile instead
reads a 128-aligned window of `col_band` source columns centered at the
tile's mean horizontal sample position (a dynamic lane-dim VMEM slice),
cutting dot FLOPs by W/col_band (1.7x at 640). Out-of-window taps
contribute zero; `col_coverage` monitors the in-window fraction.

Row windowing (the same idea along y): a coordinate tile is 128
consecutive pixels of ONE output row, so its y-taps span just that row's
horizontal flow variation — yet the dot's lhs was the whole [3*48, WB]
block band. Each tile instead reads a 16-aligned WIN_ROWS=32 window per
channel (three dynamic sublane slices concatenated to a [96, WB] lhs),
cutting dot FLOPs by another 1/3 and fitting one MXU M-tile instead of
two. `col_coverage` folds the row-window retention into its metric.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unsupervised_pseuso_lidar_tpu.ops.resample import _block_flow_centers

LANES = 128
# Per-tile row window (multiple of 16): each 128-pixel coordinate tile
# holds one output row, so its y-taps span only that row's horizontal
# flow variation — a handful of band rows, not the whole block band.
# The x-interpolation dots contract a win_rows slice per channel instead
# of the full band: at the default band_pad=12 (band 48 rows after the
# 16-row Mosaic alignment) this cuts every dot's FLOPs by 1/3 AND fits
# the [3*32, WB] lhs in a single MXU M-tile (96 <= 128 rows) where
# [3*48, WB] needed two passes — measured 2x fewer MXU cycles per tile.
WIN_ROWS = 32


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _fwd_kernel(starts_ref, c0_ref, r0_ref, planes_ref, x0_ref, wx1_ref,
                k0_ref, wy1_ref, *refs, num_tiles,
                band_rows, win_rows, plane_rows, width, col_band,
                num_blocks, with_taps):
    if with_taps:
        (out_r, out_g, out_b, dxr, dxg, dxb, dyr, dyg, dyb, band) = refs
        out_refs = (out_r, out_g, out_b, dxr, dxg, dxb, dyr, dyg, dyb)
    else:
        (out_r, out_g, out_b, band) = refs
        out_refs = (out_r, out_g, out_b)
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = starts_ref[b, t]
    for c in range(3):
        # start and plane_rows are multiples of 16 by construction
        band[pl.ds(c * band_rows, band_rows), :] = planes_ref[
            0, pl.ds(pl.multiple_of(c * plane_rows + start, 16), band_rows), :
        ]

    banded = col_band < width
    windowed = win_rows < band_rows
    # Mosaic only allows tile-aligned dynamic vector loads/stores: fetch
    # 8 sublane rows (= 8 coordinate tiles) at a time, then index rows
    # statically. All per-pixel vectors live as [1, 128] lane rows; the
    # indicators are built transposed so no lane<->sublane relayout is
    # needed.
    iw_t = jax.lax.broadcasted_iota(jnp.int32, (col_band, LANES), 0)
    # y-selection mask over ONE channel's window rows [KW, 128]; channels
    # read their slice of the x-interpolated taps statically — 3x less
    # compare/mask work than a per-channel mask over the full stack.
    ik_t = jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 0)

    def tile8(ii, carry):
        base = pl.multiple_of(ii * 8, 8)
        x08 = x0_ref[0, 0, pl.ds(base, 8), :]          # [8, 128] int32
        wx18 = wx1_ref[0, 0, pl.ds(base, 8), :]
        k08 = k0_ref[0, 0, pl.ds(base, 8), :]
        wy18 = wy1_ref[0, 0, pl.ds(base, 8), :]
        outs = [[] for _ in out_refs]
        for r in range(8):
            x0r = x08[r : r + 1, :]                    # [1, 128]
            wx1r = wx18[r : r + 1, :]
            k0r = k08[r : r + 1, :]
            wy1r = wy18[r : r + 1, :]
            idx = (b * num_blocks + t) * num_tiles + base + r
            if banded:
                # per-tile column window: x0 is pre-shifted by the window
                # start (128-aligned, SMEM-prefetched flat) in _prepare
                c0 = pl.multiple_of(c0_ref[idx], LANES)
                cols = pl.ds(c0, col_band)
            else:
                cols = pl.ds(0, width)
            if windowed:
                # per-tile row window: k0 is pre-shifted by the 16-aligned
                # window start in _prepare; band_rows is a multiple of 16
                # whenever windowing is enabled (_prepare's gate), so the
                # alignment hints are honest
                r0 = pl.multiple_of(r0_ref[idx], 16)
                band_r = jnp.concatenate(
                    [
                        band[pl.ds(pl.multiple_of(c * band_rows + r0, 16),
                                   win_rows), cols]
                        for c in range(3)
                    ],
                    axis=0,
                )                                      # [3KW, WB]
            else:
                # window IS the band (win_rows == band_rows): read it
                # whole — no dynamic row offset, no (possibly false)
                # multiple-of-16 claim when band_rows isn't 16-aligned
                band_r = band[:, cols]                 # [3KW, WB]
            # PURE 0/1 indicator one-hots (bf16-exact) for the two x taps;
            # the bilinear weights are applied AFTER the dot, in f32, on
            # the [3KW, 128] tap tensors — ~2x less VPU build work on the
            # dominant [WB, 128] tensors than weighted one-hots, and both
            # taps come back from ONE [3KW, WB] x [WB, 256] MXU dot.
            ind01 = jnp.concatenate(
                [
                    jnp.where(iw_t == x0r, 1.0, 0.0),
                    jnp.where(iw_t == x0r + 1, 1.0, 0.0),
                ],
                axis=1,
            ).astype(jnp.bfloat16)                     # [WB, 256]
            taps = jax.lax.dot_general(
                band_r, ind01,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [3KW, 256]
            t0x = taps[:, :LANES]                      # [3KW, 128]
            t1x = taps[:, LANES:]
            xint_t = (1.0 - wx1r) * t0x + wx1r * t1x   # [3KW, 128] f32
            v0 = (k0r >= 0) & (k0r <= win_rows - 1)
            v1 = (k0r + 1 >= 0) & (k0r + 1 <= win_rows - 1)
            m0 = jnp.where((ik_t == k0r) & v0, 1.0, 0.0)   # [KW, 128]
            m1 = jnp.where((ik_t == k0r + 1) & v1, 1.0, 0.0)
            sel = m0 * (1.0 - wy1r) + m1 * wy1r        # [KW, 128], shared
            if with_taps:
                # d(out)/dx taps: xint of the x-DERIVATIVE (t1x - t0x),
                # y-interpolated with the same sel; d(out)/dy taps:
                # tap1 - tap0 (the y-lerp endpoints' difference). Emitted
                # per channel so the custom-VJP backward is PURE
                # elementwise math — no backward kernel, no second
                # _prepare, no second one-hot build.
                dxint_t = t1x - t0x
                dmask = m1 - m0
            for c in range(3):
                xint_c = xint_t[c * win_rows : (c + 1) * win_rows, :]
                outs[c].append(
                    jnp.sum(xint_c * sel, axis=0, keepdims=True)
                )                                      # [1, 128]
                if with_taps:
                    dxint_c = dxint_t[c * win_rows : (c + 1) * win_rows, :]
                    outs[3 + c].append(
                        jnp.sum(dxint_c * sel, axis=0, keepdims=True)
                    )
                    outs[6 + c].append(
                        jnp.sum(xint_c * dmask, axis=0, keepdims=True)
                    )
        for rows, out_ref in zip(outs, out_refs):
            out_ref[0, 0, pl.ds(base, 8), :] = jnp.concatenate(rows, axis=0)
        return carry

    jax.lax.fori_loop(0, num_tiles // 8, tile8, 0)


def band_window_rows(rows_per_block: int, band_pad: int) -> tuple:
    """(band_rows, win_rows) for the kernel's tiling — the SINGLE source
    of truth shared by _prepare, col_coverage, and fused_warp_flops.

    band_rows includes the +16 Mosaic sublane-alignment pad; win_rows is
    WIN_ROWS when the band is 16-row sliceable with >= one 16-step of
    play, else the whole band (windowing disabled)."""
    band_rows = rows_per_block + 2 * band_pad + 16
    if band_rows % 16 == 0 and band_rows - WIN_ROWS >= 16:
        return band_rows, WIN_ROWS
    return band_rows, band_rows


def resolve_col_band(width: int, col_band) -> int:
    """Concrete column-window width: `width` disables banding.

    Auto (None): 384 when the width is lane-aligned and wide enough for
    the window to pay off; otherwise full width (no banding)."""
    if col_band is None:
        col_band = 384 if (width % LANES == 0 and width >= 512) else width
    if not (0 < col_band < width) or width % LANES != 0 \
            or col_band % LANES != 0:
        return width
    return col_band


def _row_window_starts(
    k0_t: jax.Array, band_rows: int, win_rows: int
) -> jax.Array:
    """16-aligned per-tile row-window starts from band-relative tap rows.

    k0_t: [B, T, NT, 128] int32 band-relative y-tap indices (tap0). The
    window [r0, r0+win_rows) is CENTERED on the mean in-band tap of the
    tile (nearest 16-multiple, clipped into the band), mirroring
    `_column_window_starts` — centering keeps the majority of taps when
    the tile's y-span exceeds the window. (An earlier min-anchored
    variant let a single outlier tap snap the window away from the
    majority: with an untrained depth net the per-tile y-span is 40-85
    rows, retention collapsed to ~0.73, and training could not escape
    the constant-depth basin — mean-centering restores band-level
    retention there.) Taps outside the window read zero exactly like
    out-of-band taps, and `col_coverage` accounts for them."""
    in_band = (k0_t >= -1) & (k0_t <= band_rows - 1)
    cnt = jnp.sum(in_band, axis=-1)
    mean_k0 = jnp.sum(
        jnp.where(in_band, k0_t, 0), axis=-1
    ) / jnp.maximum(cnt, 1)
    r0_raw = (mean_k0 - (win_rows - 1) / 2.0) / 16.0
    r0 = jnp.clip(
        jnp.round(r0_raw).astype(jnp.int32) * 16, 0, band_rows - win_rows
    )
    r0 = jnp.where(cnt > 0, r0, 0)
    return jax.lax.stop_gradient(r0.astype(jnp.int32))


def _band_starts_and_taps(
    y: jax.Array,
    height: int,
    rows: int,
    num_blocks: int,
    band_pad: int,
    band_rows: int,
):
    """16-aligned per-block band starts + band-relative tap rows.

    Single source of truth shared by the kernel preprocessing
    (`_prepare`) and the `col_coverage` monitor — the monitor is only
    truthful if both compute identical bands (same contract as
    `_column_window_starts` / `_row_window_starts`).

    y: [B, num_blocks*rows, W] unnormalized sample rows (already padded
    to a whole number of blocks). Returns (starts [B, T], k0 [B, T,
    rows*W] int32 band-relative tap0 rows, plane_rows).
    """
    batch, _, width = y.shape
    y0 = jnp.floor(y).astype(jnp.int32)
    centers = _block_flow_centers(y, height, rows, num_blocks)
    # planes must be at least one band tall: with small heights the
    # aligned plane (e.g. 32 rows at H=8, pad=12) can be SHORTER than the
    # band (48 rows incl. the +16 Mosaic pad), and the kernel's per-plane
    # dynamic slice would then clamp its start — silently shifting the
    # c>0 channel bands by the overhang (observed: channel-2 taps off by
    # 16 rows at H=8, wrong data and gradients)
    plane_rows = max(
        -(-(height + 2 * band_pad) // 16) * 16, band_rows
    )
    max_start = plane_rows - band_rows
    starts = jnp.clip(
        jnp.arange(num_blocks)[None, :] * rows + centers, 0, max_start
    ).astype(jnp.int32)  # [B, T]
    starts = (starts // 16) * 16
    k0 = (
        y0.reshape(batch, num_blocks, rows * width)
        + band_pad
        - starts[..., None]
    ).astype(jnp.int32)
    return starts, k0, plane_rows


def _column_window_starts(
    x_t: jax.Array, width: int, wb: int, kw: int | None = None
) -> jax.Array:
    """128-aligned column-window starts per coordinate tile.

    x_t: [B, T, NT, 128] unnormalized sample columns. Single source of
    truth shared by the kernel preprocessing (_prepare) and the
    `col_coverage` monitor — the monitor is only truthful if both compute
    identical windows.

    width is the TRUE image width (tap-validity space); kw the padded
    kernel lane width the window must fit inside (defaults to width)."""
    kw = width if kw is None else kw
    valid = (x_t > -1.0) & (x_t < width)
    cnt = jnp.sum(valid, axis=-1)
    mean_x = jnp.sum(jnp.where(valid, x_t, 0.0), axis=-1) / jnp.maximum(cnt, 1)
    c0_raw = (mean_x - (wb - 1) / 2.0) / LANES
    c0s = jnp.clip(jnp.round(c0_raw).astype(jnp.int32) * LANES, 0, kw - wb)
    c0s = jnp.where(cnt > 0, c0s, 0).astype(jnp.int32)
    return jax.lax.stop_gradient(c0s)


def _prepare(img, grid, band_pad, rows_per_block, col_band=None):
    """Shared coordinate/band preprocessing. Returns kernel inputs.

    Arbitrary widths are handled by lane-padding: source planes gain
    zero columns and the output grid gains out-of-image sentinel columns
    up to the next multiple of 128. Pad taps read zero exactly like
    out-of-image taps (zeros padding semantics), and _untile crops the
    output back to the true width — so the fused kernel serves ALL
    widths (e.g. KITTI-native 1242), not just lane-aligned ones.
    Coordinate normalization stays in the ORIGINAL width's pixel space
    (align_corners uses width-1 of the true image)."""
    batch, height, width, channels = img.shape
    rows, pad = rows_per_block, band_pad
    assert channels == 3
    out_h = height
    out_w = width
    pad_w = (-width) % LANES
    if pad_w:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, pad_w), (0, 0)),
                       constant_values=-3.0)
    kw = width + pad_w  # kernel lane width (plane columns, output tiles)
    pad_h = (-out_h) % rows
    if pad_h:
        grid = jnp.pad(grid, ((0, 0), (0, pad_h), (0, 0), (0, 0)),
                       constant_values=-3.0)
    num_blocks = (out_h + pad_h) // rows
    rw = rows * kw
    assert rw % LANES == 0, "rows_per_block*width must be a multiple of 128"
    num_tiles = rw // LANES

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    # normalized coords map to the TRUE image's pixel space; sentinel
    # columns land far outside [0, width) and read zero in the kernel
    x = (gx + 1.0) * 0.5 * (width - 1)
    y = (gy + 1.0) * 0.5 * (height - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    x0 = x0f.astype(jnp.int32)

    # Mosaic requires dynamic sublane slices at multiple-of-16 offsets:
    # pad plane height to 16 and align band starts down to 16 (band grows
    # by 16 rows so coverage is preserved). band_window_rows is the single
    # source of truth for this tiling (shared with col_coverage and
    # fused_warp_flops).
    band_rows, win_rows = band_window_rows(rows, pad)
    starts, k0, plane_rows = _band_starts_and_taps(
        y, height, rows, num_blocks, pad, band_rows
    )
    # channels-first + row pad + reshape (layout-preserving) + one more
    # row-pad for the zero plane; avoids minor-dim strided channel slices,
    # which miscompile under jit on the axon v5e (observed: plane content
    # off by up to 255 vs eager)
    planes = jnp.moveaxis(img, -1, 1)  # [B, 3, H, KW] (lane-padded)
    planes = jnp.pad(
        planes, ((0, 0), (0, 0), (pad, plane_rows - height - pad), (0, 0))
    ).reshape(batch, 3 * plane_rows, kw)
    planes = planes.astype(jnp.bfloat16)  # [B, 3*Hp, KW]

    assert num_tiles % 8 == 0, "rows_per_block*width must be a multiple of 1024"

    def to_tiles(a):
        # [B, T(*), rw] -> [B, T, NT, 128]: tile i holds pixels i*128+s
        return a.reshape(batch, num_blocks, num_tiles, LANES)

    x0_t = to_tiles(x0.reshape(batch, num_blocks, rw))
    wx1_t = to_tiles(wx1.reshape(batch, num_blocks, rw)).astype(jnp.float32)
    k0_t = to_tiles(k0)
    wy1_t = to_tiles(wy1.reshape(batch, num_blocks, rw)).astype(jnp.float32)

    # Column banding: per coordinate tile (128 consecutive output pixels),
    # restrict the x-interpolation dot to a 128-aligned window of `wb`
    # source columns centered at the tile's mean horizontal sample
    # position — the dominant dot's FLOPs scale with the window, not the
    # image width. Out-of-window taps contribute zero, exactly like
    # out-of-image taps; `col_coverage` monitors the in-window fraction.
    # banding is resolved against the PADDED lane width (so e.g. a true
    # width of 1242 pads to 1280 and still gets the 384-column window);
    # the tap-validity mask inside _column_window_starts stays in the
    # true image's pixel space
    wb = resolve_col_band(kw, col_band)
    if wb < kw:
        x_t = to_tiles(x.reshape(batch, num_blocks, rw))
        c0s = _column_window_starts(x_t, width, wb, kw)  # [B, T, NT]
        x0_t = x0_t - c0s[..., None]                   # window-relative
    else:
        c0s = jnp.zeros((batch, num_blocks, num_tiles), jnp.int32)
    # scalar-prefetch arrays live in SMEM (~1 MB): keep c0s 1-D — a
    # trailing dim of NT would be lane-padded to 128 and overflow SMEM
    # beyond ~batch 36 (observed at b48: 1.7 MB > 1 MB)
    c0s = c0s.reshape(batch * num_blocks * num_tiles)

    # Per-tile row window (see WIN_ROWS / band_window_rows): when
    # windowing is disabled the window IS the band and r0 stays 0.
    if win_rows < band_rows:
        r0s = _row_window_starts(k0_t, band_rows, win_rows)  # [B, T, NT]
        k0_t = k0_t - r0s[..., None]                   # window-relative
        r0s = r0s.reshape(batch * num_blocks * num_tiles)
    else:
        r0s = jnp.zeros((batch * num_blocks * num_tiles,), jnp.int32)

    shape = dict(
        batch=batch, height=height, width=kw, rows=rows,
        band_rows=band_rows, win_rows=win_rows, plane_rows=plane_rows,
        num_blocks=num_blocks, num_tiles=num_tiles, out_h=out_h,
        out_w=out_w, col_band=wb,
    )
    return starts, c0s, r0s, planes, x0_t, wx1_t, k0_t, wy1_t, shape


def _tile_spec(shape):
    # index maps under PrefetchScalarGridSpec receive the scalar refs too
    return pl.BlockSpec(
        (1, 1, shape["num_tiles"], LANES),
        lambda b, t, starts, c0s, r0s: (b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _plane_spec(shape):
    return pl.BlockSpec(
        (1, 3 * shape["plane_rows"], shape["width"]),
        lambda b, t, starts, c0s, r0s: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _grid_spec(shape, num_inputs, num_outputs):
    tile = _tile_spec(shape)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(shape["batch"], shape["num_blocks"]),
        in_specs=[_plane_spec(shape)] + [tile] * num_inputs,
        out_specs=[tile] * num_outputs,
        scratch_shapes=[pltpu.VMEM((3 * shape["band_rows"], shape["width"]),
                                   jnp.bfloat16)],
    )


def _untile(a, shape):
    # [B, T, NT, 128] -> [B, H, W] (crop row AND lane padding)
    batch = shape["batch"]
    return a.reshape(
        batch, shape["num_blocks"] * shape["rows"], shape["width"]
    )[:, : shape["out_h"], : shape["out_w"]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def grid_sample_mxu_fused(
    img: jax.Array,
    grid: jax.Array,
    band_pad: int = 12,
    rows_per_block: int = 8,
    interpret: bool | None = None,
    col_band: int | None = None,
    img_is_data: bool = False,
) -> jax.Array:
    """Fused-Pallas bilinear warp (see module docstring).

    Args:
      col_band: x-interpolation column-window width (None = auto: 384 on
        lane-aligned widths >= 512, else full width). The dominant MXU
        dots contract over this window instead of the full image width —
        1.7x fewer FLOPs at 640. Sample points whose horizontal distance
        from the tile mean exceeds ~(col_band - 256)/2 + 63 px read zero;
        `col_coverage` monitors the in-window fraction.
      img_is_data: the kernel has NO d(out)/d(img) path — the photometric
        loss warps DATA frames, whose cotangent is discarded, so the
        training step never needs one. Differentiating through this op
        requires the caller to assert that contract by passing True
        (the VJP then emits a zero img gradient, which is exact for any
        non-differentiated leaf); with the default False, any gradient
        through the op raises. Warping a NETWORK OUTPUT (feature-metric
        or depth-consistency losses) must use warp_impl 'gather'/'mxu',
        whose img gradients are real.
    """
    out, _, _ = _run_kernel(img, grid, band_pad, rows_per_block, interpret,
                            col_band, with_taps=False)
    return out


def _run_kernel(img, grid, band_pad, rows_per_block, interpret,
                col_band=None, with_taps=False):
    """Launch the fused warp kernel. Returns (out, dx_taps, dy_taps);
    the tap planes are None unless with_taps (the VJP-forward path)."""
    if interpret is None:
        interpret = not _on_tpu()
    starts, c0s, r0s, planes, x0_t, wx1_t, k0_t, wy1_t, shape = _prepare(
        img, grid, band_pad, rows_per_block, col_band
    )
    # materialize kernel operands in canonical layout: without this,
    # jit-fused producers hand Mosaic non-default layouts and the kernel
    # reads garbage (observed on v5e: eager exact, jitted wrong)
    starts, c0s, r0s, planes, x0_t, wx1_t, k0_t, wy1_t = (
        jax.lax.optimization_barrier(
            (starts, c0s, r0s, planes, x0_t, wx1_t, k0_t, wy1_t)
        )
    )
    num_outputs = 9 if with_taps else 3
    kernel = functools.partial(
        _fwd_kernel,
        num_tiles=shape["num_tiles"],
        band_rows=shape["band_rows"],
        win_rows=shape["win_rows"],
        plane_rows=shape["plane_rows"],
        width=shape["width"],
        col_band=shape["col_band"],
        num_blocks=shape["num_blocks"],
        with_taps=with_taps,
    )
    tiles_shape = jax.ShapeDtypeStruct(x0_t.shape, jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(shape, num_inputs=4, num_outputs=num_outputs),
        out_shape=[tiles_shape] * num_outputs,
        interpret=interpret,
    )(starts, c0s, r0s, planes, x0_t, wx1_t, k0_t, wy1_t)
    out = jnp.stack(
        [_untile(c, shape) for c in outs[:3]], axis=-1
    ).astype(img.dtype)
    if not with_taps:
        return out, None, None
    dx_taps = jnp.stack([_untile(c, shape) for c in outs[3:6]], axis=-1)
    dy_taps = jnp.stack([_untile(c, shape) for c in outs[6:9]], axis=-1)
    return out, dx_taps, dy_taps


def _fwd(img, grid, band_pad, rows_per_block, interpret, col_band=None,
         img_is_data=False):
    """custom_vjp forward rule: one kernel launch computes the warp AND
    its per-pixel d(out)/dx, d(out)/dy tap planes (pure indicator
    one-hots + ONE [3KW, WB] x [WB, 256] MXU dot per tile), so the
    backward pass needs NO kernel at all — just two fused elementwise
    contractions with the output cotangent. Replaces the former mirror
    backward kernel (second _prepare + weighted one-hot rebuild + two
    extra MXU dots), which dominated the warp's measured 18.5 ms/step
    (ROOFLINE.json r3: 3.7x above the FLOP bound, VPU-bound on the
    one-hot build)."""
    out, dx_taps, dy_taps = _run_kernel(
        img, grid, band_pad, rows_per_block, interpret, col_band,
        with_taps=True,
    )
    return out, (img, grid, dx_taps, dy_taps)


def _bwd(band_pad, rows_per_block, interpret, col_band, img_is_data,
         residuals, g):
    img, grid, dx_taps, dy_taps = residuals
    if not img_is_data:
        # loud contract (advisor/VERDICT r2 weak #4): without the caller's
        # explicit assertion that `img` is a data frame, a zero img
        # cotangent would silently zero real gradients the day someone
        # warps a network output (feature-metric / depth-consistency)
        raise ValueError(
            "grid_sample_mxu_fused has no d(out)/d(img): differentiating "
            "through it requires img_is_data=True (valid ONLY when `img` "
            "is a data frame whose gradient is unused — the photometric-"
            "loss case). To warp a network output under a gradient, use "
            "warp_impl='gather' or 'mxu' instead."
        )
    g32 = g.astype(jnp.float32)
    dx = jnp.sum(g32 * dx_taps, axis=-1)               # [B, H, W]
    dy = jnp.sum(g32 * dy_taps, axis=-1)
    height, width = g.shape[1], g.shape[2]
    # x = (gx+1)/2*(W-1); y = (gy+1)/2*(H-1) — W is the TRUE image width
    # (coordinates normalize in the unpadded pixel space)
    d_grid = jnp.stack(
        [dx * (0.5 * (width - 1)), dy * (0.5 * (height - 1))],
        axis=-1,
    ).astype(grid.dtype)
    return jnp.zeros_like(img), d_grid


grid_sample_mxu_fused.defvjp(_fwd, _bwd)


def fused_warp_flops(
    batch: int,
    height: int,
    width: int,
    col_band: int | None = None,
    rows_per_block: int = 8,
    band_pad: int = 12,
    backward: bool = False,
) -> int:
    """Analytic MXU FLOPs of one grid_sample_mxu_fused call.

    pallas_call is a custom call — opaque to XLA's cost model
    (`compile().cost_analysis()` reports 0 FLOPs for it), so MFU
    accounting (bench.py) must add the kernel's dot work analytically.
    Counts the x-interpolation dots only (the dominant cost; the y
    reduction is VPU work). backward=False: the primal (non-diff) kernel,
    ONE [3*win_rows, wb] x [wb, 128] dot per 128-pixel tile.
    backward=True: the TOTAL work of a differentiated call — the
    VJP-forward kernel's [3*win_rows, wb] x [wb, 256] two-tap dot (2x the
    primal's MACs); the custom-VJP backward itself runs NO kernel (pure
    elementwise contractions with the emitted gradient-tap planes), so
    this one number covers fwd+bwd. Over ceil(H/rows)*rows padded output
    rows."""
    kw = width + (-width) % LANES  # _prepare lane-pads to the kernel width
    wb = resolve_col_band(kw, col_band)
    _, win = band_window_rows(rows_per_block, band_pad)
    pad_h = (-height) % rows_per_block
    pixels = batch * (height + pad_h) * kw
    macs = pixels * 3 * win * wb
    return 2 * macs * (2 if backward else 1)


def col_coverage(
    grid: jax.Array,
    col_band: int | None = None,
    rows_per_block: int = 8,
    band_pad: int = 12,
) -> jax.Array:
    """Fraction of in-image/in-band taps the kernel's per-tile windows keep.

    Covers BOTH window approximations of grid_sample_mxu_fused: the
    column window (col_band source columns per 128-pixel tile) and the
    row window (WIN_ROWS band rows per tile), each recomputed with the
    exact `_column_window_starts` / `_row_window_starts` the kernel uses.
    1.0 means windowing drops nothing for this grid (the vertical-band
    approximation itself is monitored separately by
    `ops.resample.band_coverage`). Returns 1.0 when both windows are
    disabled for this shape."""
    batch, height, width, _ = grid.shape
    rows = rows_per_block
    # mirror _prepare's lane padding: the kernel runs at the padded width
    pad_w = (-width) % LANES
    kw = width + pad_w
    wb = resolve_col_band(kw, col_band)
    band_rows, win_rows = band_window_rows(rows, band_pad)
    row_windowed = win_rows < band_rows
    if wb >= kw and not row_windowed:
        return jnp.ones(())
    if pad_w:
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, pad_w), (0, 0)),
                       constant_values=-3.0)
    pad_h = (-height) % rows
    if pad_h:
        grid = jnp.pad(grid, ((0, 0), (0, pad_h), (0, 0), (0, 0)),
                       constant_values=-3.0)
    num_blocks = (height + pad_h) // rows
    rw = rows * kw
    num_tiles = rw // LANES

    def to_tiles(a):
        return a.reshape(batch, num_blocks, num_tiles, LANES)

    x = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (width - 1)
    x_t = to_tiles(x)
    x0_abs = jnp.floor(x_t).astype(jnp.int32)
    if wb < kw:
        # the kernel's exact windows (true-width validity, padded clamp)
        c0s = _column_window_starts(x_t, width, wb, kw)
        x0 = x0_abs - c0s[..., None]
        # per tap: must be inside the window unless it is out of the IMAGE
        # (out-of-image taps contribute zero in the full-width kernel too)
        xok = [
            ((x0 + d >= 0) & (x0 + d <= wb - 1))
            | (x0_abs + d < 0) | (x0_abs + d > width - 1)
            for d in (0, 1)
        ]
    else:
        xok = [jnp.ones(x_t.shape, bool)] * 2
    xvalid = [
        (x0_abs + d >= 0) & (x0_abs + d <= width - 1) for d in (0, 1)
    ]
    x_in_image = (x_t > -1.0) & (x_t < width)

    y = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (height - 1)
    if row_windowed:
        # _prepare's band-relative tap rows, from the SAME helper
        _, k0_raw, _ = _band_starts_and_taps(
            y, height, rows, num_blocks, band_pad, band_rows
        )
        k0_t = to_tiles(k0_raw)
        r0s = _row_window_starts(k0_t, band_rows, win_rows)
        k0 = k0_t - r0s[..., None]
        yok = [
            ((k0 + d >= 0) & (k0 + d <= win_rows - 1))
            | (k0_t + d < 0) | (k0_t + d > band_rows - 1)
            for d in (0, 1)
        ]
        yvalid = [
            (k0_t + d >= 0) & (k0_t + d <= band_rows - 1) for d in (0, 1)
        ]
    else:
        yok = [jnp.ones(x_t.shape, bool)] * 2
        yvalid = [jnp.ones(x_t.shape, bool)] * 2

    # all four bilinear taps: retained iff both 1-D windows keep them;
    # normalize by taps the windowless banded kernel would read (neither
    # out-of-image-x nor out-of-band-y taps count either way)
    covered = jnp.zeros((), jnp.float32)
    total = jnp.zeros((), jnp.float32)
    real = jnp.zeros(x_t.shape, bool)
    real = real.reshape(batch, num_blocks * rows, kw)
    real = real.at[:, :height, :width].set(True).reshape(x_t.shape)
    for dx in range(2):
        for dy in range(2):
            valid = xvalid[dx] & x_in_image & yvalid[dy] & real
            ok = xok[dx] & yok[dy] & valid
            covered += jnp.sum(ok.astype(jnp.float32))
            total += jnp.sum(valid.astype(jnp.float32))
    return covered / jnp.maximum(total, 1.0)
