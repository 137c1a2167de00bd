"""Single-image depth inference entry point.

Parity: /root/reference/inference.py:8-46 (load checkpoint, run the depth
model on one frame, emit 1/disparity) — with direct image input instead of
re-instantiating a full Trainer, and optional pseudo-LiDAR output.

Usage:
  python -m unsupervised_pseuso_lidar_tpu.cli.inference \
      --config configs/basic_config.yaml --image frame.png \
      [--checkpoint pretrained/model] [--calib KITTI/2011_09_26 --cloud out.npy]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Single-image depth inference")
    parser.add_argument("--config", default="configs/basic_config.yaml")
    parser.add_argument("--image", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir (default: config path)")
    parser.add_argument("--torch-checkpoint", default=None,
                        help="reference .pth checkpoint to import")
    parser.add_argument("--output", default=None, help="save depth .npy/.png")
    parser.add_argument("--calib", default=None,
                        help="KITTI calib dir: also emit a pseudo-LiDAR cloud")
    parser.add_argument("--cloud", default=None, help="cloud output .npy")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unsupervised_pseuso_lidar_tpu.geometry.warp import disp_to_depth
    from unsupervised_pseuso_lidar_tpu.train.config import load_config
    from unsupervised_pseuso_lidar_tpu.train.trainer import create_train_state
    from unsupervised_pseuso_lidar_tpu.utils.transforms import load_image

    config = load_config(args.config)
    state, depth_model, _, _ = create_train_state(
        config, jax.random.PRNGKey(config.action.random_seed)
    )
    # one shared weight-resolution path with cli/export (accepts every
    # documented blob shape: full reference checkpoint, bare state dict,
    # torchvision ImageNet weights, or an orbax dir; an explicit
    # --checkpoint that restores nothing is an error)
    from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
        load_serving_weights,
    )

    params, batch_stats, _ = load_serving_weights(
        config, state,
        torch_checkpoint=args.torch_checkpoint, checkpoint=args.checkpoint,
    )

    img, _, _ = load_image(args.image, config.image_shape)

    # params passed as args (large jit-baked constants are pathologically
    # slow on tunneled devices)
    @jax.jit
    def run(variables, img):
        disps = depth_model.apply(variables, img[None], train=False)
        return disp_to_depth(disps[0][..., 0])[0]

    depth_vars = {
        "params": params["depth"], "batch_stats": batch_stats["depth"]
    }
    depth = np.asarray(run(depth_vars, jnp.asarray(img)))
    print(
        f"depth: shape={depth.shape} min={depth.min():.2f} "
        f"max={depth.max():.2f} median={np.median(depth):.2f} m"
    )
    if args.output:
        if args.output.endswith(".npy"):
            np.save(args.output, depth)
        else:
            from PIL import Image

            vis = (255 * (1.0 / depth) / (1.0 / depth).max()).astype(np.uint8)
            Image.fromarray(vis).save(args.output)
        print(f"wrote {args.output}")

    if args.calib:
        from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import PseudoLiDAR

        cloud = PseudoLiDAR(args.calib).project_PL(depth)
        print(f"pseudo-LiDAR cloud: {cloud.shape[0]} points")
        if args.cloud:
            from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
                save_cloud,
            )

            # .bin = KITTI velodyne format, drop-in for 3D detectors
            save_cloud(args.cloud, cloud)
            print(f"wrote {args.cloud}")
    return depth


if __name__ == "__main__":
    main()
