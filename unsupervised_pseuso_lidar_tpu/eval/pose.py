"""Pose / ego-motion evaluation: snippet ATE + geodesic rotation error.

The reference never evaluates its pose network numerically — its only
pose "evaluation" is a hand-pasted dump of pose-net outputs next to the
OXTS ground truth (/root/reference/notes/what_the_hell.txt; the per-step
pose print at /root/reference/losses.py:121). This module makes that
comparison a first-class, jittable metric following the standard
SfMLearner-family protocol:

  * **ATE** (Absolute Trajectory Error): per 3-frame snippet
    (tgt -> ref0, tgt -> ref1), the predicted relative translations are
    scale-aligned to the ground truth with the least-squares factor
    s = <t_gt, t_pred> / <t_pred, t_pred> (self-supervised monocular
    training has a global scale ambiguity — the same reason depth eval
    median-scales), then the RMSE over the snippet's frame positions is
    averaged over the batch. `ate_unscaled` reports the same RMSE
    without the alignment (meaningful when training was scale-anchored,
    e.g. semi-supervised on OXTS).
  * **rot_err_deg**: geodesic angle of R_pred @ R_gt^T, the
    rotation-part analog, in degrees (scale alignment does not apply).

Conventions: both the pose net and the data pipeline's `oxts` field emit
warp-convention 6-vecs — axis-angle rotation, tgt -> ref direction
(geometry/oxts.relative_pose_6dof standardizes the KITTI loader on it;
data/synthetic.py already used it) — so the default comparison is
axis-angle vs axis-angle. `gt_mode='euler'` remains available for
external euler-parameterized trajectories; each side is converted with
its own convention, so the metric is exact even at large angles where
the parameterizations diverge.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from unsupervised_pseuso_lidar_tpu.geometry.se3 import (
    euler2mat,
    pose_matrix,
)


def _to_matrices(poses: jax.Array, mode: str) -> jax.Array:
    """[..., 6] pose vectors -> ([..., 3, 3] rotations, [..., 3] translations)."""
    if mode == "axis_angle":
        # flatten leading dims: pose_matrix's axis-angle path special-cases
        # ndim==3 inputs as [B, 1, 3] (rot_from_axisangle strips the middle
        # axis), which would silently misread a [B, N, 6] snippet layout
        lead = poses.shape[:-1]
        mat = pose_matrix(poses.reshape(-1, 6)).reshape(*lead, 4, 4)
        return mat[..., :3, :3], mat[..., :3, 3]
    if mode == "euler":
        return euler2mat(poses[..., :3]), poses[..., 3:]
    raise ValueError(f"Unknown pose convention: {mode!r}")


def pose_errors(
    pred_poses: jax.Array,
    gt_poses: jax.Array,
    pred_mode: str = "axis_angle",
    gt_mode: str = "axis_angle",
    eps: float = 1e-8,
) -> Dict[str, jax.Array]:
    """Snippet ATE + rotation error between predicted and GT pose sets.

    Args:
      pred_poses: [B, N, 6] predicted tgt->ref 6-DoF vectors (N transforms
        per snippet; the training layout is N=2: tgt->t-1, tgt->t+1).
      gt_poses: [B, N, 6] ground-truth vectors (same layout).
      pred_mode / gt_mode: rotation convention of each side —
        'axis_angle' (the pose-net/warp/oxts convention) or 'euler'
        (external euler-parameterized pose sets).
    Returns:
      {'ate': scale-aligned snippet ATE (same unit as the GT translations),
       'ate_unscaled': ATE without the per-snippet scale alignment,
       'rot_err_deg': mean geodesic rotation error in degrees,
       'scale': mean per-snippet least-squares scale factor}
    """
    rot_p, t_p = _to_matrices(pred_poses.astype(jnp.float32), pred_mode)
    rot_g, t_g = _to_matrices(gt_poses.astype(jnp.float32), gt_mode)

    # per-snippet least-squares scale over the stacked translations
    num = jnp.sum(t_g * t_p, axis=(-2, -1))
    den = jnp.maximum(jnp.sum(t_p * t_p, axis=(-2, -1)), eps)
    scale = num / den  # [B]

    def rmse(diff):  # [B, N, 3] -> [B]
        return jnp.sqrt(jnp.mean(jnp.sum(diff**2, axis=-1), axis=-1))

    ate = jnp.mean(rmse(scale[..., None, None] * t_p - t_g))
    ate_unscaled = jnp.mean(rmse(t_p - t_g))

    # geodesic angle of the residual rotation R_pred @ R_gt^T
    rel = jnp.einsum("...ij,...kj->...ik", rot_p, rot_g)
    trace = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    rot_err = jnp.mean(jnp.degrees(jnp.arccos(cos)))

    return {
        "ate": ate,
        "ate_unscaled": ate_unscaled,
        "rot_err_deg": rot_err,
        "scale": jnp.mean(scale),
    }


def pose_forward(pose_model, params, batch_stats, batch):
    """Bare pose-net forward on a NORMALIZED batch dict: the one shared
    apply-with-optional-batch-stats fragment every pose-metric surface
    (this module, cli/odometry, benchmark row 5c) composes."""
    pose_in = {"params": params["pose"]}
    if batch_stats["pose"]:
        pose_in["batch_stats"] = batch_stats["pose"]
    return pose_model.apply(
        pose_in,
        batch["tgt"],
        [batch["ref_imgs"][:, 0], batch["ref_imgs"][:, 1]],
    )


def make_pose_eval_step(pose_model, semi_sup_pose: bool = False):
    """Jitted step(state, batch) -> pose metrics vs the batch's OXTS GT.

    This is the standalone pose-only surface (no depth model needed);
    the per-epoch validation path computes the SAME pose_errors inside
    the full eval step (train/trainer.make_eval_step(pose_metrics=True))
    from the pose forward the loss already ran.

    Consumes the same host batches as training/validation (the `oxts`
    field is the camera-frame odometry the reference's semi-supervised
    path trains on, /root/reference/trainer.py:301-305). When
    `semi_sup_pose` training was active the "prediction" IS the OXTS
    pose, so the metric degenerates to 0 — kept for API symmetry."""
    from unsupervised_pseuso_lidar_tpu.train.trainer import (
        normalize_uint8_batch,
    )

    def step(state, batch):
        batch = normalize_uint8_batch(batch)
        if semi_sup_pose:
            poses = batch["oxts"]
        else:
            poses = pose_forward(
                pose_model, state.params, state.batch_stats, batch
            )
        return pose_errors(
            poses.astype(jnp.float32),
            batch["oxts"].astype(jnp.float32),
            pred_mode="axis_angle",  # oxts IS the warp convention
        )

    return jax.jit(step)
