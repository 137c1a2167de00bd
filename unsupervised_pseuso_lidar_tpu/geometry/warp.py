"""Differentiable inverse warping — the heart of the photometric loss.

Parity: /root/reference/geometry/pose_geometry.py:70-95 (disp_to_depth) and
:201-228 (inverse_warp = reconstruct -> transform -> project -> grid_sample).

TPU design: the whole chain (backprojection einsum, 4x4 pose product,
projection einsum, bilinear gather, photometric difference) is one jitted
dataflow graph with static shapes, so XLA fuses everything around the
single gather. No per-frame Python loops survive tracing — the caller
vectorizes over (frames, scales) with stacked tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unsupervised_pseuso_lidar_tpu.geometry.camera import backproject, project
from unsupervised_pseuso_lidar_tpu.geometry.se3 import pose_matrix
from unsupervised_pseuso_lidar_tpu.ops.resample import grid_sample, grid_sample_mxu


def disp_to_depth(disp: jax.Array, alpha: float = 10.0, beta: float = 0.01) -> jax.Array:
    """Network sigmoid output -> depth: D = 1 / (alpha * disp + beta).

    Parity: /root/reference/geometry/pose_geometry.py:70-95, minus the
    nested list-of-lists plumbing (callers map this over pytrees instead).
    """
    return 1.0 / (alpha * disp + beta)


def depth_to_disp(
    depth: jax.Array, alpha: float = 10.0, beta: float = 0.01
) -> jax.Array:
    """Inverse of disp_to_depth (for checkpoint/eval round trips)."""
    return (1.0 / depth - beta) / alpha


def disp_to_depth_ranged(
    disp: jax.Array, min_depth: float = 0.1, max_depth: float = 100.0
):
    """monodepth2-style range-parameterized conversion: returns
    (scaled_disp, depth) with depth in [min_depth, max_depth].

    Parity: /root/reference/models/layers.py:10-19 (the variant the
    decoder blocks ship with but the active loss path does not use).
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


def warp_coords(
    depth: jax.Array,
    transform: jax.Array,
    intrinsics: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Target-frame depth + rigid transform -> [B, H, W, 2] normalized
    sample coordinates (the grid_sample grid), exposed so callers can
    reuse the coords (e.g. for coverage monitoring) without recomputing.

    Same math as project(backproject(...)) (the reference's
    reconstruct -> transform -> project chain,
    /root/reference/geometry/transform.py:74-150) but algebraically
    collapsed for TPU: with P = K @ T[:3],

        cam = K (R (K^-1 u_h) D + t) = D * (P[:, :3] K^-1) u_h + P[:, 3]

    so after folding the two 3x3 products into one per-job matrix M, the
    per-pixel work is an affine function of the iota pixel grid times
    depth — pure elementwise/broadcast ops that XLA fuses straight into
    the warp kernel's coordinate preprocessing. The einsum formulation
    materialized three [B, H, W, 3] MXU dot results (rays, points, cam)
    per call, forward AND backward — measured ~2 ms/step of pure HBM
    traffic on the b12 training step."""
    if intrinsics.ndim == 2:
        intrinsics = intrinsics[None]
    _, height, width = depth.shape
    dtype = depth.dtype
    hp = jax.lax.Precision.HIGHEST
    k = intrinsics.astype(jnp.float32)
    k_inv = jnp.linalg.inv(k)
    proj = jnp.einsum(
        "bij,bjk->bik", k, transform[:, :3, :].astype(jnp.float32),
        precision=hp,
    )  # [B,3,4]
    m = jnp.einsum(
        "bij,bjk->bik", proj[:, :, :3], k_inv, precision=hp
    ).astype(dtype)  # [B,3,3] = K T[:3,:3] K^-1
    t = proj[:, :, 3].astype(dtype)  # [B,3] = K T[:3,3]
    u = jnp.arange(width, dtype=dtype)[None, None, :]
    v = jnp.arange(height, dtype=dtype)[None, :, None]

    def cam_row(i: int) -> jax.Array:
        affine = (
            m[:, i, 0][:, None, None] * u
            + m[:, i, 1][:, None, None] * v
            + m[:, i, 2][:, None, None]
        )
        return depth * affine + t[:, i][:, None, None]

    z = cam_row(2) + eps
    x = cam_row(0) / z
    y = cam_row(1) / z
    gx = (x / (width - 1) - 0.5) * 2.0
    gy = (y / (height - 1) - 0.5) * 2.0
    return jnp.stack([gx, gy], axis=-1)


def sample_with_impl(
    img: jax.Array,
    coords: jax.Array,
    impl: str = "gather",
    padding_mode: str = "zeros",
    mesh=None,
    col_band: int | None = None,
    img_is_data: bool = False,
) -> jax.Array:
    """Bilinear-sample `img` at normalized `coords` with the selected
    implementation (see inverse_warp_from_matrix for the impl contract).

    mesh: when the caller runs under a jax.sharding.Mesh, pass it so the
    Pallas kernel is wrapped in shard_map over the "data" axis —
    pallas_call does not partition under GSPMD, but the kernel's grid is
    per-batch-row so batch-dim sharding is exact: each shard runs the
    kernel on its local rows and no collective is needed.

    col_band: the fused kernel's column-window width (None = auto, 384 on
    lane-aligned widths >= 512); narrower windows cut the dominant dot's
    FLOPs proportionally at the cost of horizontal-flow coverage
    (`col_coverage` monitors it). Ignored by 'gather'/'mxu'.

    img_is_data: assertion that `img` is a DATA frame whose gradient is
    never consumed — required to differentiate through impl='pallas',
    whose kernel has no d(out)/d(img) path (the loss stack passes True;
    anything warping a network output must use 'gather'/'mxu')."""
    if impl in ("mxu", "pallas"):
        if padding_mode != "zeros":
            raise ValueError(
                f"impl={impl!r} supports padding_mode='zeros' only"
            )
        batch, _, width, channels = img.shape
        # the fused kernel lane-pads any width internally (zero source
        # columns + sentinel output columns, ops/pallas/warp._prepare),
        # so the only structural requirement left is 3 channels
        if impl == "pallas" and channels == 3:
            from unsupervised_pseuso_lidar_tpu.ops.pallas.warp import (
                grid_sample_mxu_fused,
            )

            def fused(i, c):
                # positional band_pad/rows_per_block/interpret/col_band/
                # img_is_data: they are custom_vjp nondiff args
                return grid_sample_mxu_fused(
                    i, c, 12, 8, None, col_band, img_is_data
                )

            if (
                mesh is not None
                and "data" in mesh.axis_names
                and mesh.shape["data"] > 1
                and batch % mesh.shape["data"] == 0
            ):
                from jax.sharding import NamedSharding, PartitionSpec as P

                # Anchor the kernel inputs to the exact layout shard_map
                # consumes: batch over "data", everything else replicated.
                # Without the explicit constraint GSPMD propagates a
                # spatially-sharded layout into the shard_map boundary and
                # resolves the mismatch with an involuntary FULL
                # rematerialization (replicate-then-partition, the XLA
                # warning seen in r2's 4x2-mesh dryrun); constrained, the
                # reshard lowers to one all-gather along "spatial" — which
                # the kernel needs anyway (its grid is per-batch-row over
                # full image rows).
                data_only = NamedSharding(
                    mesh, P("data", *([None] * (img.ndim - 1)))
                )
                img = jax.lax.with_sharding_constraint(img, data_only)
                coords = jax.lax.with_sharding_constraint(coords, data_only)
                spec = P("data")
                sharded = jax.shard_map(
                    fused,
                    mesh=mesh,
                    in_specs=(spec, spec),
                    out_specs=spec,
                    # pallas_call out_shapes carry no vma info; the kernel
                    # is per-batch-row so data-axis variance is trivially
                    # correct — skip the varying-mesh-axes check
                    check_vma=False,
                )
                return sharded(img, coords)
            return fused(img, coords)
        return grid_sample_mxu(img, coords)
    if impl != "gather":
        raise ValueError(f"Unknown warp impl: {impl}")
    return grid_sample(img, coords, align_corners=True, padding_mode=padding_mode)


def inverse_warp_from_matrix(
    img: jax.Array,
    depth: jax.Array,
    transform: jax.Array,
    intrinsics: jax.Array,
    padding_mode: str = "zeros",
    impl: str = "gather",
    img_is_data: bool = False,
) -> jax.Array:
    """inverse_warp with a pre-assembled [B, 4, 4] rigid transform.

    This is the vectorization-friendly entry point: the loss stack folds
    every (frame-pair, scale) warp of a training step into ONE call by
    stacking jobs along the batch axis — a single XLA gather instead of
    2·scales+1 small ones (the reference loops Python-side per pair/scale,
    losses.py:209-223).

    impl: 'gather' (exact, XLA gather on the VPU), 'mxu' (band-limited
    one-hot matmul on the systolic array — ~6x faster on v5e, exact up to
    bf16 weight rounding while vertical flow stays within the band; see
    ops.resample.grid_sample_mxu), or 'pallas' (the fused Pallas kernel —
    ~14x the gather path; same semantics as 'mxu' but it has NO gradient
    path for `img`: differentiating through it requires the explicit
    `img_is_data=True` assertion that `img` is a data frame whose
    cotangent is discarded — the photometric-loss case — and raises
    otherwise). 'pallas' serves any width (the kernel lane-pads
    internally) and falls back to 'mxu' only for C != 3.
    """
    coords = warp_coords(depth, transform, intrinsics)
    return sample_with_impl(
        img, coords, impl=impl, padding_mode=padding_mode,
        img_is_data=img_is_data,
    )


def coverage_from_coords(
    coords: jax.Array,
    band_pad: int = 12,
    rows_per_block: int = 8,
    include_col: bool = True,
    col_band: int | None = None,
):
    """Banded-kernel approximation coverage from already-computed coords.

    The free-of-charge variant of `warp_coverage`: the loss stack computes
    `coords` for every (direction, pair, scale) warp job anyway; feeding
    the SAME stacked coords here monitors every transform of the step
    (t0, t1, and the inverted backward pose — not just a ref0-forward
    proxy) without re-running the backproject/project chain."""
    from unsupervised_pseuso_lidar_tpu.ops.pallas.warp import col_coverage
    from unsupervised_pseuso_lidar_tpu.ops.resample import band_coverage

    out = {"band_coverage": band_coverage(coords, band_pad, rows_per_block)}
    if include_col:
        out["col_coverage"] = col_coverage(
            coords, col_band, rows_per_block, band_pad
        )
    return jax.lax.stop_gradient(out)


def warp_coverage(
    depth: jax.Array,
    transform: jax.Array,
    intrinsics: jax.Array,
    band_pad: int = 12,
    rows_per_block: int = 8,
):
    """Approximation-coverage of the banded warp kernels for this warp.

    Returns {band_coverage, col_coverage}: the fraction of in-image sample
    points inside the vertical flow band (ops.resample.band_coverage) and
    the horizontal column window (ops.pallas.warp.col_coverage). Both are
    1.0 when the 'mxu'/'pallas' warp implementations are exact (up to bf16
    rounding) for this (depth, pose); below 1.0, the out-of-band fraction
    reads zero and biases the photometric loss — surface these in training
    metrics whenever a banded warp_impl is active."""
    if intrinsics.ndim == 2:
        intrinsics = intrinsics[None]
    coords = warp_coords(depth, transform, intrinsics)
    return coverage_from_coords(coords, band_pad, rows_per_block)


def inverse_warp(
    img: jax.Array,
    depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    invert_pose: bool = False,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Warp a source image into the target frame via target depth + pose.

    Args:
      img: [B, H, W, 3] source image (where pixels are sampled from).
      depth: [B, H, W] target-frame depth map.
      pose: [B, 6] 6-DoF pose (axis-angle[3], translation[3]), target->source.
      intrinsics: [B, 3, 3] or [3, 3] camera intrinsics.
      invert_pose: statically-known flag — use the inverted pose (the
        reference's pose_inv argument, pose_geometry.py:222-223).
      padding_mode: sampling padding ('zeros' to match the reference).
    Returns:
      [B, H, W, 3] the source image warped onto the target image plane.

    Parity: /root/reference/geometry/pose_geometry.py:201-228. The
    rotation is interpreted as axis-angle through
    transformation_from_parameters (pose_geometry.py:219-220), despite the
    reference signature's 'euler' default naming.
    """
    transform = pose_matrix(pose, invert=invert_pose)  # [B,4,4]
    return inverse_warp_from_matrix(
        img, depth, transform, intrinsics, padding_mode=padding_mode
    )
