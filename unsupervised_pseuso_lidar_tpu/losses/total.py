"""Top-level training objective: reprojection + smoothness.

Parity: /root/reference/losses.py:262-271 (Losses.forward): disparities ->
depths via disp_to_depth, bidirectional reprojection loss, second-order
smoothness over the target-frame depth pyramid. Returns the two components
separately (the trainer sums them, /root/reference/trainer.py:264).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from unsupervised_pseuso_lidar_tpu.geometry.warp import disp_to_depth
from unsupervised_pseuso_lidar_tpu.losses.reprojection import reprojection_loss
from unsupervised_pseuso_lidar_tpu.losses.smoothness import smooth_loss


def normalize_depth(depth: jax.Array) -> jax.Array:
    """Per-image INVERSE-depth mean normalization (public helper — the
    eval/visualization paths that replicate the training-side depth
    conditioning import this, e.g. examples/dino_turntable.py):
    depth * mean_i(1/depth), i.e. warp with mean(disp-scaled)/disp-scaled.

    Quotients the global-scale direction out of the warp: a uniform
    inverse-depth scaling leaves the normalized map (and hence the
    photometric loss) EXACTLY unchanged, so the shrinking-depth runaway
    (disparity saturating at the sigmoid ceiling within a few steps of
    random init — measured on benchmarks/reference_loop.py's scene) has
    no gradient to ride. The published cure for this degeneracy
    (Wang et al., CVPR 2018 'Learning Depth from Monocular Videos using
    Direct Methods' §3.1; SC-SfMLearner's disp/mean(disp) form, adopted
    here). Normalizing on the DISPARITY side rather than the depth side
    matters: depth-side normalization still rewards saturating the
    sigmoid (1/(10σ+0.01) compresses a wide σ-range into near-constant
    depth — a 'flatten the scene' shortcut that parks σ where its
    gradient dies, measured on the same scene), while here flatness
    requires genuinely constant σ, reachable at healthy mid-range
    activations. Monocular depth is scale-ambiguous anyway (eval
    median-scales), so nothing is lost."""
    inv = 1.0 / jnp.maximum(depth, 1e-7)
    m = jnp.mean(inv, axis=tuple(range(1, depth.ndim)), keepdims=True)
    return depth * m


# backward-compatible private alias (pre-r5 import path)
_mean_normalize = normalize_depth


def total_loss(
    tgt: jax.Array,
    refs: Sequence[jax.Array],
    disparities: Sequence[Sequence[jax.Array]],
    poses: jax.Array,
    intrinsics: jax.Array,
    mode: str = "mean",
    smooth_decay: float = 2.3,
    smooth_weight: float = 1.0,
    smooth_on: str = "depth",
    warp_impl: str = "gather",
    with_coverage: bool = False,
    mesh=None,
    col_band: int | None = None,
    depth_norm: bool = False,
    ident_scale: jax.Array | float = 1.0,
    no_ssim: bool = False,
    min_bidirectional: bool = True,
):
    """Compute (reprojection_loss, smoothness_loss)
    — or (reprojection_loss, smoothness_loss, coverage_dict) when
    with_coverage (banded-warp health metrics computed from the loss's own
    warp coords; covers every transform of the step at zero geometry cost).

    Args:
      tgt: [B, H, W, 3] target frame.
      refs: two [B, H, W, 3] reference frames.
      disparities: [disps_of_tgt, disps_of_ref0], each a list over scales
        of [B, h, w, 1] network outputs.
      poses: [B, 2, 6].
      intrinsics: [B, 3, 3] (or [3, 3]).
      smooth_weight: scale on the smoothness term (the reference adds it
        unweighted, trainer.py:264).
      smooth_on: 'depth' reproduces the reference (losses.py:269 smooths
        depths[0]) — NOTE this term is badly conditioned: near the
        disparity ceiling depth ~ 1/disp amplifies noise by 1/disp^2 and
        the smoothness gradient can dominate the photometric one, pushing
        disparity to saturation. 'disp' smooths the raw disparity maps
        (the monodepth2-standard, well-conditioned choice).
      depth_norm: per-image mean-normalize each depth map before warping
        (see normalize_depth) — kills the uniform-scale runaway; the pose
        net then learns translation in scene-relative units. Off by
        default (reference parity); the production objective turns it on.
      ident_scale: mode='min' only — multiplier on the automask identity
        term (see min_reprojection_loss; the trainer's automask_warmup
        ramp drives it from ~1e4 down to 1).
      min_bidirectional: mode='min' only — add the reference's backward
        direction (warp tgt into ref0's frame with ref0's depth,
        losses.py:194-223) so the second depth forward carries loss
        signal; measured to close most of the equal-step convergence gap
        on benchmarks/reference_loop.py. On by default.
    """
    depths = [[disp_to_depth(d) for d in frame] for frame in disparities]
    if depth_norm:
        depths = [[normalize_depth(d) for d in frame] for frame in depths]
    if mode == "min":
        # monodepth2-style per-pixel minimum over refs with SSIM blend and
        # automasking (the reference's latent objective, losses.py:156-167,
        # made selectable; 'mean' is its active default behavior).
        from unsupervised_pseuso_lidar_tpu.losses.reprojection import (
            min_reprojection_loss,
        )

        loss_reproj = min_reprojection_loss(
            tgt, refs, depths[0], poses, intrinsics, warp_impl=warp_impl,
            with_coverage=with_coverage, mesh=mesh, col_band=col_band,
            ident_scale=ident_scale, no_ssim=no_ssim,
            depths_ref0=depths[1] if min_bidirectional else None,
        )
    else:
        loss_reproj = reprojection_loss(
            tgt, refs, depths, poses, intrinsics, mode=mode,
            warp_impl=warp_impl, with_coverage=with_coverage, mesh=mesh,
            col_band=col_band,
        )
    coverage = None
    if with_coverage:
        loss_reproj, coverage = loss_reproj
    if smooth_on == "depth":
        loss_smooth = smooth_loss(depths[0], decay=smooth_decay)
    elif smooth_on == "disp":
        loss_smooth = smooth_loss(disparities[0], decay=smooth_decay)
    else:
        raise ValueError(f"smooth_on must be 'depth' or 'disp', got {smooth_on}")
    if with_coverage:
        return loss_reproj, smooth_weight * loss_smooth, coverage
    return loss_reproj, smooth_weight * loss_smooth


@dataclass
class Losses:
    """Object-style wrapper mirroring the reference API
    (/root/reference/losses.py:56-271)."""

    mode: str = "mean"
    smooth_decay: float = 2.3
    smooth_weight: float = 1.0
    smooth_on: str = "depth"
    warp_impl: str = "gather"

    def forward(self, tgt, refs, disparities, poses, intrinsics, gt=None):
        return total_loss(
            tgt,
            refs,
            disparities,
            poses,
            intrinsics,
            mode=self.mode,
            smooth_decay=self.smooth_decay,
            smooth_weight=self.smooth_weight,
            smooth_on=self.smooth_on,
            warp_impl=self.warp_impl,
        )

    __call__ = forward
