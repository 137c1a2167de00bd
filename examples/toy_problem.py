"""Toy problem: depth-only training in a controlled-geometry scene.

Parity role of /root/reference/notes/toy_problem/ (the 36-frame dinosaur
turntable with known projection matrices used as a correctness oracle):
here the oracle is the synthetic plane scene with exactly-known depth and
poses. The pose network is bypassed (ground-truth poses, the reference's
semi_sup_pose path) so ONLY the depth net trains — if the geometry stack
is correct, predicted depth must converge toward the true plane depth.

Usage: python examples/toy_problem.py [--steps 200]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(steps: int = 200, batch: int = 4, height: int = 64, width: int = 96,
        scene_depth: float = 10.0, cam_tx: float = 0.01, verbose: bool = True):
    # NOTE: cam_tx is small so the initial warp displacement (at the
    # network's untrained depth ~0.2 m) stays inside the photometric basin
    # of attraction (< half the texture period). With a large baseline the
    # local gradient beyond the texture correlation length is noise and
    # disparity collapses — the same degenerate regime the reference's
    # 0.06-scaled pose head avoids (/root/reference/models/pose/pose_net.py:74)
    # and likely what notes/what_the_hell.txt documents.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unsupervised_pseuso_lidar_tpu.data.synthetic import synthetic_triplet_batch
    from unsupervised_pseuso_lidar_tpu.geometry.warp import disp_to_depth
    from unsupervised_pseuso_lidar_tpu.train.config import Config
    from unsupervised_pseuso_lidar_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    config = Config.from_dict(
        {
            "model": {
                "name": "toy",
                "depth": {"name": "DispResNet"},
                "pose": {"name": "PoseNet"},
            },
            "datasets": {
                "augmentation": {"image_width": width, "image_height": height},
                "sequence_length": 3,
            },
            "action": {
                "batch_size": batch,
                "semi_sup_pose": True,
                # well-conditioned objective for the depth-only oracle:
                # disparity smoothness at monodepth2 weight (the reference's
                # unweighted depth smoothness is what collapses training,
                # see losses/total.py docstring)
                "smooth_on": "disp",
                "smooth_weight": 1e-3,
                "optimizer": {"depth": {"lr": 1e-4}, "pose": {"lr": 1e-4}},
            },
        }
    )
    state, depth_model, pose_model, tx = create_train_state(
        config, jax.random.PRNGKey(0), steps_per_epoch=steps
    )
    step = make_train_step(
        depth_model, pose_model, tx, semi_sup_pose=True,
        smooth_on="disp", smooth_weight=1e-3,
    )

    def depth_error(state, batch):
        disps = depth_model.apply(
            {
                "params": state.params["depth"],
                "batch_stats": state.batch_stats["depth"],
            },
            batch["tgt"],
            train=False,
        )
        depth = disp_to_depth(disps[0][..., 0])
        return float(jnp.abs(depth - scene_depth).mean())

    errors = []
    for i in range(steps):
        raw = synthetic_triplet_batch(
            batch, height, width, seed=i, depth=scene_depth, tx=cam_tx
        )
        device_batch = {
            k: jnp.asarray(v) for k, v in raw.items() if k != "groundtruth"
        }
        state, metrics = step(state, device_batch)
        if i == 0 or (i + 1) % max(steps // 10, 1) == 0:
            err = depth_error(state, device_batch)
            errors.append(err)
            if verbose:
                print(
                    f"step {i + 1:4d} loss={float(metrics['loss']):.4f} "
                    f"mean |depth - {scene_depth}| = {err:.3f} m"
                )
    return errors


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    args = parser.parse_args()
    errors = run(steps=args.steps)
    improved = errors[-1] < errors[0]
    print(f"depth error {errors[0]:.3f} -> {errors[-1]:.3f} m "
          f"({'improved' if improved else 'NOT improved'})")
