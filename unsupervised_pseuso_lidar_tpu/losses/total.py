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

from unsupervised_pseuso_lidar_tpu.geometry.warp import disp_to_depth
from unsupervised_pseuso_lidar_tpu.losses.reprojection import reprojection_loss
from unsupervised_pseuso_lidar_tpu.losses.smoothness import smooth_loss


def total_loss(
    tgt: jax.Array,
    refs: Sequence[jax.Array],
    disparities: Sequence[Sequence[jax.Array]],
    poses: jax.Array,
    intrinsics: jax.Array,
    mode: str = "mean",
    smooth_decay: float = 2.3,
) -> Tuple[jax.Array, jax.Array]:
    """Compute (reprojection_loss, smoothness_loss).

    Args:
      tgt: [B, H, W, 3] target frame.
      refs: two [B, H, W, 3] reference frames.
      disparities: [disps_of_tgt, disps_of_ref0], each a list over scales
        of [B, h, w, 1] network outputs.
      poses: [B, 2, 6].
      intrinsics: [B, 3, 3] (or [3, 3]).
    """
    depths = [[disp_to_depth(d) for d in frame] for frame in disparities]
    loss_reproj = reprojection_loss(tgt, refs, depths, poses, intrinsics, mode=mode)
    loss_smooth = smooth_loss(depths[0], decay=smooth_decay)
    return loss_reproj, loss_smooth


@dataclass
class Losses:
    """Object-style wrapper mirroring the reference API
    (/root/reference/losses.py:56-271)."""

    mode: str = "mean"
    smooth_decay: float = 2.3

    def forward(self, tgt, refs, disparities, poses, intrinsics, gt=None):
        return total_loss(
            tgt,
            refs,
            disparities,
            poses,
            intrinsics,
            mode=self.mode,
            smooth_decay=self.smooth_decay,
        )

    __call__ = forward
