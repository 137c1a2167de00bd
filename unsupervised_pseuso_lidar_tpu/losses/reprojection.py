"""Multi-scale bidirectional photometric reprojection loss.

Capability parity with /root/reference/losses.py:183-240 (the active
training loss) and :86-181 (the latent min/automask variant), redesigned
for TPU:

  * Every (direction, frame-pair, scale) warp of a step is folded along the
    batch axis into ONE inverse-warp call — one XLA gather + one fused
    photometric reduction instead of the reference's Python-side loop of
    2·scales+1 separate grid_sample launches.
  * Per-scale depths are bilinearly upsampled to full resolution before
    warping, exactly like the reference (losses.py:214-215).

Reference-bug policy (SURVEY.md §7 — reproduce the intended math, not the
accident; each deviation documented):
  * losses.py:199-203 mutates `poses` inside the loop and compares the
    backward warp (tgt warped into ref0's frame with ref0's depth and the
    inverted pose_0) against refs[1]. The intended target is refs[0] —
    implemented here as intended.
  * the reference's float64 casts in mse/l1 modes (losses.py:230-236) are
    kept fp32: TPUs have no f64 and the loss is a mean of bounded values.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from unsupervised_pseuso_lidar_tpu.geometry.se3 import invert_pose, pose_matrix
from unsupervised_pseuso_lidar_tpu.geometry.warp import (
    coverage_from_coords,
    sample_with_impl,
    warp_coords,
)
from unsupervised_pseuso_lidar_tpu.losses.photometric import photometric_loss
from unsupervised_pseuso_lidar_tpu.ops.resample import resize_bilinear


def _full_res_depth(depth: jax.Array, height: int, width: int) -> jax.Array:
    """[B, h, w, 1] scale-s depth -> [B, H, W] full resolution."""
    if depth.ndim == 3:
        depth = depth[..., None]
    return resize_bilinear(depth, height, width)[..., 0]


def _data_only_anchor(mesh, warp_impl: str):
    """Sharding anchor for the job-stacked loss tensors under a 2-D
    (data x spatial) mesh.

    Left unanchored, GSPMD propagates a merged sharding (image H split
    over BOTH mesh axes) into the job-stacking concatenates and then
    resolves the mismatch with the fused-warp shard_map boundary by an
    involuntary full rematerialization (replicate-then-partition — the
    XLA warning in r2's 4x2 dryrun). Anchoring every stacked operand and
    result to the canonical P("data", "spatial") layout makes the concat
    itself zero-communication, and the later conversion to the kernel's
    batch-only layout (geometry/warp.sample_with_impl) lowers to ONE
    all-gather along "spatial" — which the kernel needs anyway: its grid
    is per-batch-row over full image rows.

    Returns an identity function unless a (data x spatial) mesh is
    active."""
    if (
        mesh is None
        or "spatial" not in mesh.axis_names
        or "data" not in mesh.axis_names
        or mesh.shape["data"] <= 1
    ):
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec as P

    def anchor(x):
        # [JB, H, ...]: batch over "data", image rows over "spatial"
        spec = P("data", "spatial", *([None] * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return anchor


def reprojection_loss(
    tgt: jax.Array,
    refs: Sequence[jax.Array],
    depths: Sequence[Sequence[jax.Array]],
    poses: jax.Array,
    intrinsics: jax.Array,
    mode: str = "mean",
    warp_impl: str = "gather",
    with_coverage: bool = False,
    mesh=None,
    col_band: int | None = None,
):
    """Bidirectional multi-scale reprojection loss.

    Args:
      tgt: [B, H, W, 3] target frame.
      refs: two [B, H, W, 3] reference frames (t-1, t+1).
      depths: [depths_of_tgt, depths_of_ref0], each a list over scales of
        [B, h_s, w_s, 1] depth maps (finest first) — the output of
        disp_to_depth applied to the two depth-model passes
        (/root/reference/trainer.py:296-299).
      poses: [B, 2, 6] target->ref 6-DoF poses (axis-angle, translation).
      intrinsics: [B, 3, 3].
      mode: 'mean' (the reference's active 'min' branch, which reduces the
        two forward pairs by mean — losses.py:227), 'l1', 'mse', or 'ssim'
        (the latent SSIM-blend path, losses.py:76-77 made functional).
      warp_impl: 'gather' (exact) or 'mxu' (band-matmul warp on the
        systolic array, ~6x faster — geometry.warp.inverse_warp_from_matrix).
      with_coverage: also return the banded-kernel coverage metrics
        computed from the SAME stacked coords as the warp (covers every
        transform of the step: t0, t1, inverted backward — zero extra
        geometry work, stop-gradient'd).
    Returns:
      scalar loss, or (loss, coverage_dict) when with_coverage.

    Reduction structure (parity with losses.py:189-240): per scale s the
    forward direction contributes mean(L1(w0s), L1(w1s)) and the backward
    direction contributes L1(bws); the total is the mean over all 2·S
    contributed entries.
    """
    batch, height, width, _ = tgt.shape
    num_scales = len(depths[0])

    t0 = pose_matrix(poses[:, 0])
    t1 = pose_matrix(poses[:, 1])
    t0_inv = invert_pose(t0)

    src_imgs: List[jax.Array] = []
    tgt_imgs: List[jax.Array] = []
    transforms: List[jax.Array] = []
    depth_maps: List[jax.Array] = []
    weights: List[float] = []

    # Forward: warp each ref into the target frame with the target's depth.
    # Each scale contributes one loss entry = mean over the 2 pairs, and
    # the final reduction divides by 2*num_scales entries.
    fwd_w = 1.0 / (2.0 * num_scales) / 2.0
    for scale_depth in depths[0]:
        depth_full = _full_res_depth(scale_depth, height, width)
        for ref, transform in ((refs[0], t0), (refs[1], t1)):
            src_imgs.append(ref)
            tgt_imgs.append(tgt)
            transforms.append(transform)
            depth_maps.append(depth_full)
            weights.append(fwd_w)

    # Backward: warp the target into ref0's frame with ref0's depth and the
    # inverted pose (intended semantics of losses.py:199-203, see module
    # docstring).
    bwd_w = 1.0 / (2.0 * num_scales)
    for scale_depth in depths[1]:
        depth_full = _full_res_depth(scale_depth, height, width)
        src_imgs.append(tgt)
        tgt_imgs.append(refs[0])
        transforms.append(t0_inv)
        depth_maps.append(depth_full)
        weights.append(bwd_w)

    jobs = len(src_imgs)
    anchor = _data_only_anchor(mesh, warp_impl)
    src = anchor(jnp.concatenate([anchor(x) for x in src_imgs], axis=0))
    target = anchor(jnp.concatenate([anchor(x) for x in tgt_imgs], axis=0))
    transform = jnp.concatenate(transforms, axis=0)
    depth = anchor(jnp.concatenate([anchor(x) for x in depth_maps], axis=0))
    if intrinsics.ndim == 2:
        # one shared camera: broadcast to the batch BEFORE tiling per job,
        # so k_tiled matches the [jobs*B] concatenated batch rows
        intrinsics = jnp.broadcast_to(intrinsics[None], (batch, 3, 3))
    k_tiled = jnp.tile(intrinsics, (jobs, 1, 1))

    coords = warp_coords(depth, transform, k_tiled)
    # img_is_data: every warped source here is a DATA frame (tgt/refs),
    # so the Pallas kernel's no-d(img) contract holds by construction
    warped = sample_with_impl(
        src, coords, impl=warp_impl, mesh=mesh, col_band=col_band,
        img_is_data=True,
    )
    coverage = (
        coverage_from_coords(
            coords, include_col=(warp_impl == "pallas"), col_band=col_band
        )
        if with_coverage
        else None
    )

    if mode in ("mean", "l1"):
        err = jnp.abs(warped - target)
    elif mode == "mse":
        err = (warped - target) ** 2
    elif mode == "ssim":
        err = photometric_loss(warped, target, no_ssim=False)
    else:
        raise ValueError(f"Unsupported reprojection mode: {mode}")

    per_job = jnp.mean(err.reshape(jobs, batch, -1), axis=(1, 2))
    loss = jnp.sum(per_job * jnp.asarray(weights, dtype=per_job.dtype))
    if with_coverage:
        return loss, coverage
    return loss


def min_reprojection_loss(
    tgt: jax.Array,
    refs: Sequence[jax.Array],
    depths: Sequence[jax.Array],
    poses: jax.Array,
    intrinsics: jax.Array,
    automask: bool = True,
    no_ssim: bool = False,
    warp_impl: str = "gather",
    with_coverage: bool = False,
    mesh=None,
    col_band: int | None = None,
    ident_scale: jax.Array | float = 1.0,
    depths_ref0: Sequence[jax.Array] | None = None,
):
    """monodepth2-style per-pixel-min reprojection with automasking.

    The reference scaffolds this (elementwise minimum + identity-loss
    automask, commented out at /root/reference/losses.py:156-167) but never
    activates it; here it is a first-class alternative objective.

    Automask formulation: per pixel the loss is
    ``min(min_r reproj_err_r, min_r ident_err_r + 1e-5)`` — monodepth2's
    joint minimum over reprojection AND identity errors (the +1e-5
    tie-break plays the role of monodepth2's noise: where warp and
    identity tie, the warp wins and keeps its gradient). Pixels where the
    static-scene error wins contribute the IDENTITY error — a constant
    w.r.t. parameters — NOT zero. A multiplicative mask (``err * mask``)
    is gradient-identical on unmasked pixels but changes the LOSS
    LANDSCAPE: masking a pixel drops its contribution to 0 < ident, so
    pushing every warp sample out of frame (disparity saturating at the
    0.1 m floor blows all taps out of the image) monotonically REDUCES
    such a loss toward 0 — a degenerate attractor this framework measured
    falling into within ~20 steps on the reference-loop scene
    (benchmarks/reference_loop.py). Under the joint-min form that collapse
    leaves the loss at mean(ident), which any in-frame warp improvement
    beats, so it is not an attractor.

    Args:
      depths: list over scales of target-frame depths [B, h, w, 1].
      depths_ref0: optional list over scales of REF0-frame depths. When
        given, the loss gains the reference's backward direction
        (losses.py:194-223): the target is warped into ref0's frame with
        ref0's depth and the inverted pose, joint-automasked against the
        same (tgt, ref0) identity pair, and the two directions average.
        Doubles the depth supervision per step (the second depth forward
        the trainer already runs, trainer.py:296-299, stops being
        loss-inert under 'min' mode) — measured to close most of the
        equal-step convergence gap vs the reference's bidirectional
        objective on benchmarks/reference_loop.py.
      ident_scale: multiplier on the identity error before the joint min.
        1.0 = exact monodepth2 automask. Large values (>= ~1e3) make the
        identity term unreachable wherever it is nonzero — automask
        effectively OFF for real scene content, while EXACT-zero identity
        pixels (a camera-locked object: the one case photometric
        supervision is wrong for) stay masked at any scale, because the
        ramp is multiplicative. This is deliberate — which the
        trainer's `automask_warmup` ramp uses to keep photometric
        supervision on EVERY pixel early in training: the joint min
        otherwise starves static/occluded regions of gradient from step 0,
        leaving their depth to the smoothness fill (measured: a static
        occluder's patch trains ~2x worse under 'min' than 'mean',
        benchmarks/REPORT.json occlusion_* rows). Constant w.r.t. params
        either way (the identity error carries no gradient).

    When ``with_coverage`` and ``automask``, the coverage dict gains
    ``automask_keep``: the fraction of pixels (mean over scales) whose
    WARP error wins the joint min — i.e. pixels that still receive
    photometric gradient. A sustained low value means the identity term
    is absorbing most of the image and depth is training on few pixels.
    """
    batch, height, width, _ = tgt.shape
    bidirectional = depths_ref0 is not None
    t0 = pose_matrix(poses[:, 0])
    t1 = pose_matrix(poses[:, 1])
    if intrinsics.ndim == 2:
        # see reprojection_loss: per-batch-row intrinsics before tiling
        intrinsics = jnp.broadcast_to(intrinsics[None], (batch, 3, 3))
    anchor = _data_only_anchor(mesh, warp_impl)
    srcs = [refs[0], refs[1]]
    tgts = [tgt, tgt]
    transforms = [t0, t1]
    if bidirectional:
        # backward leg (the reference's bidirectional structure,
        # losses.py:194-223): warp the TARGET into ref0's frame with
        # ref0's depth and the inverted pose — the second depth forward
        # (trainer.py:296-299) supervises a second viewpoint per step
        srcs.append(tgt)
        tgts.append(refs[0])
        transforms.append(invert_pose(t0))
    jobs = len(srcs)
    k_tiled = jnp.tile(intrinsics, (jobs, 1, 1))
    src = anchor(jnp.concatenate(srcs, axis=0))
    target = anchor(jnp.concatenate(tgts, axis=0))
    transform = jnp.concatenate(transforms, axis=0)

    if automask:
        # the identity (unwarped) photometric error is scale-invariant:
        # compute the full-res SSIM+L1 pass once, not once per scale.
        # The [2B] leading rows of (src, target) are exactly (refs, tgt),
        # so one pass serves both directions: the backward leg's identity
        # pair (tgt vs ref0, in ref0's frame) is the same image pair.
        ident_pair = photometric_loss(
            src[: 2 * batch],
            target[: 2 * batch],
            no_ssim=no_ssim,
            clip_loss=0.0,
        ).mean(axis=-1)
        # +1e-5: tie-break toward the warp so near-static pixels keep
        # their photometric gradient (monodepth2's noise, deterministic).
        # fp32 on purpose: at bf16 (relative eps ~8e-3) the 1e-5 nudge
        # rounds away against typical photometric errors (~0.1) and the
        # documented 'warp wins ties' behavior would silently not hold.
        # scale ONLY the identity term, then add the epsilon: scaling the
        # epsilon too would lift an exact-zero-identity (camera-locked)
        # pixel's automask threshold to 1e-5 * ident_scale — 0.1 at the
        # warmup start's 1e4 scale, a typical photometric-error magnitude
        # — silently unmasking it mid-warmup and breaking the documented
        # 'camera-locked pixels stay masked at any scale' guarantee.
        # Identical at ident_scale == 1.
        ident = (
            jnp.minimum(
                ident_pair[:batch], ident_pair[batch:]
            ).astype(jnp.float32)
            * ident_scale
            + 1e-5
        )
        if bidirectional:
            ident_bwd = (
                ident_pair[:batch].astype(jnp.float32) * ident_scale + 1e-5
            )

    total = jnp.asarray(0.0, dtype=tgt.dtype)
    coverages = []
    keeps = []
    for i, scale_depth in enumerate(depths):
        depth_full = _full_res_depth(scale_depth, height, width)
        depth_maps = [depth_full, depth_full]
        if bidirectional:
            depth_maps.append(
                _full_res_depth(depths_ref0[i], height, width)
            )
        coords = warp_coords(
            anchor(jnp.concatenate(depth_maps, axis=0)), transform, k_tiled
        )
        warped = sample_with_impl(
            src, coords, impl=warp_impl, mesh=mesh, col_band=col_band,
            img_is_data=True,
        )
        if with_coverage:
            coverages.append(
                coverage_from_coords(
                    coords, include_col=(warp_impl == "pallas"),
                    col_band=col_band,
                )
            )
        err = photometric_loss(
            warped,
            target,
            no_ssim=no_ssim,
            clip_loss=0.0,
        )
        err = err.mean(axis=-1)  # [jobs*B, H, W]
        # per-pixel min over refs (forward direction)
        err_f = jnp.minimum(err[:batch], err[batch : 2 * batch])
        if automask:
            # joint min with the identity error (see docstring): static /
            # occluded pixels contribute the constant ident term, never 0
            keep = jnp.mean((err_f <= ident).astype(jnp.float32))
            err_f = jnp.minimum(err_f, ident)
        scale_loss = jnp.mean(err_f)
        if bidirectional:
            err_b = err[2 * batch :]
            if automask:
                keep = 0.5 * (
                    keep + jnp.mean((err_b <= ident_bwd).astype(jnp.float32))
                )
                err_b = jnp.minimum(err_b, ident_bwd)
            scale_loss = 0.5 * (scale_loss + jnp.mean(err_b))
        if automask:
            keeps.append(keep)
        total = total + scale_loss
    loss = total / len(depths)
    if with_coverage:
        coverage = {
            k: jnp.mean(jnp.stack([c[k] for c in coverages]))
            for k in coverages[0]
        }
        if keeps:
            # fraction of pixels whose warp error wins the joint min —
            # the pixels that still carry photometric gradient
            coverage["automask_keep"] = jnp.mean(jnp.stack(keeps))
        return loss, coverage
    return loss
