"""Evaluation entry point: KITTI depth metrics over a split.

Makes the validation path the reference disabled actually run
(/root/reference/trainer.py:285 comments out validate();
/root/reference/evaluate.py computes metrics with the sq_rel bug — fixed
in eval/metrics.py).

Usage:
  python -m unsupervised_pseuso_lidar_tpu.cli.evaluate --config configs/basic_config.yaml
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="Eigen-split depth evaluation")
    parser.add_argument("--config", default="configs/basic_config.yaml")
    parser.add_argument("--split", default=None, help="override split file")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--max-batches", type=int, default=0)
    parser.add_argument("--median-scale", action="store_true",
                        help="median-scale predictions to GT before "
                        "metrics (the standard monocular/Eigen protocol "
                        "— self-supervised depth with a learned pose has "
                        "a global scale ambiguity)")
    parser.add_argument("--protocol", default=None,
                        choices=("none", "eigen"),
                        help="'eigen' = the standard KITTI Eigen-split "
                        "monocular protocol: Garg crop + [1e-3, 80] m "
                        "caps + per-image median scaling (the parity-run "
                        "setting; see docs/PARITY_RUNBOOK.md)")
    parser.add_argument("--pose-metrics", action="store_true",
                        help="also evaluate the pose net against the "
                        "split's OXTS odometry: snippet ATE "
                        "(scale-aligned + raw) and geodesic rotation "
                        "error (eval/pose.py — the reference only ever "
                        "eyeballed pose-net output vs OXTS by hand, "
                        "notes/what_the_hell.txt)")
    parser.add_argument("--velo-gt", action="store_true",
                        help="rasterize sparse GT from raw "
                        "velodyne_points/*.bin scans for split lines "
                        "without an annotated-depth column — any raw "
                        "KITTI drive yields metrics, no "
                        "data_depth_annotated archive needed")
    args = parser.parse_args(argv)

    from unsupervised_pseuso_lidar_tpu.data.kitti import UnSupKittiDataset
    from unsupervised_pseuso_lidar_tpu.train.config import load_config
    from unsupervised_pseuso_lidar_tpu.train.trainer import Trainer

    config = load_config(args.config)
    if args.split:
        config.datasets.split = args.split
    # evaluation restores the latest checkpoint when one exists
    config.action.from_scratch = False
    if args.checkpoint:
        config.action.checkpoint_dir = args.checkpoint
    if args.median_scale:
        config.action.eval_median_scale = True
    if args.protocol is not None:
        config.action.eval_protocol = args.protocol
    if args.velo_gt:
        config.datasets.velo_gt = True
    if args.pose_metrics:
        # pose metrics ride inside the jitted eval step (trainer
        # make_eval_step pose_metrics=True) — same pose forward the loss
        # already runs, one pass over the split
        config.action.eval_pose = True

    dataset = UnSupKittiDataset(config)
    trainer = Trainer(config, dataset=dataset)

    batch_size = config.action.batch_size
    indices = list(range(len(dataset)))
    if args.max_batches:
        indices = indices[: args.max_batches * batch_size]
    metrics = trainer.validate(
        # drop_last=False: protocol metrics must cover the WHOLE split —
        # the training default would silently skip len % batch_size tail
        # samples and shift reported numbers with batch size
        dataset.batches(indices, batch_size, config.action.num_workers,
                        drop_last=False)
    )
    print(json.dumps({k: round(v, 5) for k, v in metrics.items()}, indent=2))
    return metrics


if __name__ == "__main__":
    main()
