"""Odometry export: pose-net trajectory over raw KITTI drives.

Runs the pose network over every sliding window of the configured drive
tree (data.kitti.UnSupStackedDataset — the reference's GT-less stacked
dataset, /root/reference/dataloaders.py:176-251), integrates the
(t -> t+1) relative poses into camera-to-world poses, and writes the
standard KITTI odometry format. Optionally writes the OXTS ground-truth
trajectory next to it and reports eval/pose.py metrics over the drive.

Usage:
  python -m unsupervised_pseuso_lidar_tpu.cli.odometry \
      --config configs/basic_config.yaml --out poses.txt \
      [--gt-out gt_poses.txt] [--max-windows N]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="Pose-net odometry export")
    parser.add_argument("--config", default="configs/basic_config.yaml")
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint dir override (latest epoch loads)")
    parser.add_argument("--out", required=True,
                        help="predicted trajectory (KITTI odometry format)")
    parser.add_argument("--gt-out", default=None,
                        help="also write the OXTS ground-truth trajectory")
    parser.add_argument("--max-windows", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from unsupervised_pseuso_lidar_tpu.data.kitti import (
        UnSupStackedDataset,
        collate,
    )
    from unsupervised_pseuso_lidar_tpu.eval.pose import pose_errors
    from unsupervised_pseuso_lidar_tpu.eval.trajectory import (
        integrate_relative_poses,
        kitti_odometry_lines,
        relative_matrices,
    )
    from unsupervised_pseuso_lidar_tpu.train.config import load_config
    from unsupervised_pseuso_lidar_tpu.train.trainer import (
        Trainer,
        normalize_uint8_batch,
    )

    config = load_config(args.config)
    config.action.from_scratch = False  # restore the latest checkpoint
    if args.checkpoint:
        config.action.checkpoint_dir = args.checkpoint

    dataset = UnSupStackedDataset(config)
    if len(dataset) == 0:
        raise SystemExit(
            f"error: no sliding windows under {config.datasets.path!r} "
            "(expected <root>/<date>/<drive>_sync/image_02/data/*.png)"
        )
    trainer = Trainer(config, dataset=dataset)
    pose_model, state = trainer.pose_model, trainer.state

    from unsupervised_pseuso_lidar_tpu.eval.pose import pose_forward

    @jax.jit
    def predict(params, batch_stats, batch):
        batch = normalize_uint8_batch(batch)
        return pose_forward(pose_model, params, batch_stats, batch)

    import os

    # windows never span drives (data/kitti.py window filter), but the
    # SAMPLE LIST does: group by drive so each trajectory chain is one
    # continuous drive, not a bogus composition across recordings
    by_drive: dict = {}
    for i, sample in enumerate(dataset.samples):
        drive = os.path.dirname(os.path.dirname(os.path.dirname(sample.tgt)))
        by_drive.setdefault(drive, []).append(i)

    batch_size = config.action.batch_size

    def predict_drive(indices):
        rel_pred, rel_gt = [], []
        for start in range(0, len(indices), batch_size):
            chunk = indices[start : start + batch_size]
            # pad the final chunk to the full batch (repeating the last
            # window) so every drive compiles predict() exactly ONCE —
            # each distinct trailing size would otherwise retrace, and
            # compiles dominate wall-clock on tunneled devices
            padded = list(chunk) + [chunk[-1]] * (batch_size - len(chunk))
            batch = collate(
                [dataset.load_sample(i, with_groundtruth=False)
                 for i in padded]
            )
            poses = np.asarray(
                predict(state.params, state.batch_stats, batch)
            )
            rel_pred.append(poses[: len(chunk)])  # [b,2,6] (tgt->t-1, tgt->t+1)
            rel_gt.append(np.asarray(batch["oxts"])[: len(chunk)])
        return np.concatenate(rel_pred, axis=0), np.concatenate(rel_gt, axis=0)

    def exact_gt_trajectory(indices):
        """Drift-free GT: absolute OXTS world poses -> camera-0-frame
        camera poses, P_k = C @ inv(T_w_0) @ T_w_k @ C^-1 (float64) —
        NOT an integration of per-window relative vectors, which would
        re-accumulate composition error in the file that trajectory
        benchmarks treat as truth."""
        from unsupervised_pseuso_lidar_tpu.geometry.oxts import (
            load_oxts_packets_and_poses,
        )

        samples = [dataset.samples[i] for i in indices]
        # window k is centered at frame k+1: frame 0 is window 0's ref0,
        # frames 1..N are the tgt frames, frame N+1 is the last ref1
        oxts_files = (
            [samples[0].oxts[1]]
            + [s.oxts[0] for s in samples]
            + [samples[-1].oxts[2]]
        )
        world = load_oxts_packets_and_poses(oxts_files)
        c = np.asarray(samples[0].imu_to_cam, np.float64)
        c_inv = np.linalg.inv(c)
        t0_inv = np.linalg.inv(np.asarray(world[0], np.float64))
        return np.stack(
            [c @ t0_inv @ np.asarray(t, np.float64) @ c_inv for t in world]
        )

    def world_trajectory(rel, mode):
        # window k is centered at frame k+1, so rel[:, 1] chains
        # (k+1 -> k+2) transforms starting at camera 1. Window 0's FIRST
        # transform (tgt -> t-1, i.e. frame1 -> frame0 coords) IS camera
        # 1's pose in the frame-0 world: X_0 = T_10 X_1. Frame 0 is the
        # identity; frames 1+j left-compose T_10 with the camera-1-relative
        # chain.
        chain = integrate_relative_poses(rel[:, 1], mode=mode)  # [N+1,4,4]
        t10 = relative_matrices(rel[:1, 0], mode=mode)[0]
        world = np.einsum("ij,njk->nik", t10, chain)
        return np.concatenate([np.eye(4)[None], world], axis=0)

    def out_path(base, drive, multi):
        if not multi:
            return base
        stem, ext = os.path.splitext(base)
        return f"{stem}_{os.path.basename(drive)}{ext or '.txt'}"

    multi = len(by_drive) > 1
    metrics: dict = {"drives": len(by_drive), "frames": 0}
    all_pred, all_gt = [], []
    for drive, indices in sorted(by_drive.items()):
        if args.max_windows:
            indices = indices[: args.max_windows]
        pred, gt = predict_drive(indices)
        all_pred.append(pred)
        all_gt.append(gt)
        lines = kitti_odometry_lines(world_trajectory(pred, "axis_angle"))
        with open(out_path(args.out, drive, multi), "w") as f:
            f.write("\n".join(lines) + "\n")
        metrics["frames"] += len(lines)
        if args.gt_out:
            with open(out_path(args.gt_out, drive, multi), "w") as f:
                f.write(
                    "\n".join(
                        kitti_odometry_lines(exact_gt_trajectory(indices))
                    )
                    + "\n"
                )

    metrics.update(
        {
            f"pose_{k}": float(v)
            for k, v in pose_errors(
                np.concatenate(all_pred, axis=0),
                np.concatenate(all_gt, axis=0),
            ).items()
        }
    )
    print(json.dumps({k: round(v, 5) if isinstance(v, float) else v
                      for k, v in metrics.items()}, indent=2))
    return metrics


if __name__ == "__main__":
    main()
