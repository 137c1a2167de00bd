"""Streaming pseudo-LiDAR pipeline entry point.

Capability parity with the reference's three ROS nodes run together
(mock_publisher -> DepthPipeline -> PseudoLidarPipeline,
/root/reference/pseudo-lidar/): replay a KITTI drive directory, run the
depth model, backproject to pseudo-LiDAR clouds, and report throughput.
Equivalent of test_pipeline.py's end-to-end check, minus ROS.

Usage:
  python -m unsupervised_pseuso_lidar_tpu.cli.pipeline \
      --images KITTI/2011_09_26/..._sync/image_02/data \
      --calib KITTI/2011_09_26 [--model BtsModel|DispResNet] \
      [--rate 10] [--save-dir out/]
"""

from __future__ import annotations

import argparse
import json
import os
import time


class _AtFileParser(argparse.ArgumentParser):
    """@file configs in the reference's layout: '--flag value' per line
    (pseudo-lidar/config_test.txt) — argparse's default fromfile reader
    treats a whole line as ONE token, so split on whitespace."""

    def convert_arg_line_to_args(self, arg_line):
        return arg_line.split()


def main(argv=None):
    # fromfile_prefix_chars: the reference's ROS nodes take @file configs
    # (mock_publisher.py:23-24, config_test.txt) — same convention here
    parser = _AtFileParser(
        description="camera -> depth -> pseudo-LiDAR",
        fromfile_prefix_chars="@",
    )
    parser.add_argument("--images", required=True, nargs="+",
                        help="directory of PNG frames; pass several "
                        "directories for a multi-camera rig (each step "
                        "batches all cameras into one device program)")
    parser.add_argument("--calib", required=True, help="KITTI calib directory")
    parser.add_argument("--model", default="DispResNet",
                        choices=["DispResNet", "DispNetS", "StnDispNet", "BtsModel"])
    parser.add_argument("--config", default=None,
                        help="training config: serve ITS depth model with "
                        "checkpointed weights (see --checkpoint)")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir (with --config; default: "
                        "the config's checkpoint path)")
    parser.add_argument("--torch-checkpoint", default=None,
                        help="reference .pth checkpoint to import "
                        "(with --config)")
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--rate", type=float, default=0.0,
                        help="replay rate in Hz (0 = as fast as possible; the "
                        "reference pipeline runs at 10)")
    parser.add_argument("--sparsity", type=int, default=0)
    parser.add_argument("--queue-size", type=int, default=1,
                        help="input queue depth; 1 = the reference ROS "
                        "nodes' latest-wins semantics (stale frames are "
                        "dropped under load), larger for lossless replay")
    parser.add_argument("--save-dir", default=None,
                        help="save per-frame cloud files here")
    parser.add_argument("--format", default="npy", choices=["npy", "bin"],
                        help="cloud file format: npy, or bin = raw float32 "
                        "x/y/z/intensity rows (the KITTI velodyne format "
                        "downstream 3D detectors consume — the pseudo-LiDAR "
                        "paper's drop-in use case)")
    parser.add_argument("--max-frames", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unsupervised_pseuso_lidar_tpu.geometry.warp import disp_to_depth
    from unsupervised_pseuso_lidar_tpu.models import build_model
    from unsupervised_pseuso_lidar_tpu.pseudolidar.pipeline import (
        DepthToPointCloudPipeline,
        FileImageSource,
    )
    from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import PseudoLiDAR

    if args.config:
        # serve trained weights: the config's depth model + the shared
        # weight-resolution path (orbax or reference .pth)
        from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
            load_serving_weights,
        )
        from unsupervised_pseuso_lidar_tpu.train.config import load_config
        from unsupervised_pseuso_lidar_tpu.train.trainer import (
            create_train_state,
        )

        config = load_config(args.config)
        state, model, _, _ = create_train_state(
            config, jax.random.PRNGKey(config.action.random_seed)
        )
        model_name = config.model.depth.name
        params, batch_stats, source = load_serving_weights(
            config, state,
            torch_checkpoint=args.torch_checkpoint,
            checkpoint=args.checkpoint,
        )
        variables = {"params": params["depth"],
                     "batch_stats": batch_stats["depth"]}
        print(f"serving {model_name} weights from {source}")
    else:
        if args.checkpoint or args.torch_checkpoint:
            raise SystemExit("--checkpoint/--torch-checkpoint need --config "
                             "(to know the model architecture)")
        model = build_model(args.model)
        model_name = args.model
        img0 = jnp.zeros((1, args.height, args.width, 3))
        variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.PRNGKey(0), img0
        )
    if model_name == "BtsModel":
        def depth_fn(variables, img):
            outputs = model.apply(variables, img, train=False)
            return outputs[-1][..., 0]  # final metric depth
    else:
        def depth_fn(variables, img):
            disps = model.apply(variables, img, train=False)
            return disp_to_depth(disps[0][..., 0])

    projector = PseudoLiDAR(args.calib, sparsity=args.sparsity)
    pipeline = DepthToPointCloudPipeline(
        depth_fn, projector, depth_fn_args=(variables,)
    )

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    import numpy as np

    stats = {"frames": 0, "points_total": 0}
    t0 = time.perf_counter()

    multi = len(args.images) > 1

    def on_result(result):
        stats["frames"] += 1
        stats["points_total"] += result.points.shape[0]
        if args.save_dir:
            stem = (
                f"cloud_cam{result.stream_index}_{result.frame_index:06d}"
                if multi else f"cloud_{result.frame_index:06d}"
            )
            from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
                save_cloud,
            )

            save_cloud(
                os.path.join(args.save_dir, f"{stem}.{args.format}"),
                result.points,
            )

    def frames_for(image_dir):
        source = FileImageSource(
            image_dir, rate_hz=args.rate or None,
            size_hw=(args.height, args.width),
        )
        frames = iter(source)
        if args.max_frames:
            import itertools

            frames = itertools.islice(frames, args.max_frames)
        return frames

    if multi:
        processed = pipeline.run_multi(
            [frames_for(d) for d in args.images], on_result,
            queue_size=args.queue_size,
        )
    else:
        processed = pipeline.run(frames_for(args.images[0]), on_result,
                                 queue_size=args.queue_size)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "frames": processed,
                "streams": len(args.images),
                "seconds": round(dt, 3),
                "hz": round(processed / dt, 2) if dt else None,
                "avg_points_per_cloud": (
                    round(stats["points_total"] / max(stats["frames"], 1))
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
