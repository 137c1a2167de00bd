"""Export a trained depth model (optionally fused with the pseudo-LiDAR
projector) as a portable StableHLO serving artifact.

The reference has no export story — serving means unpickling a torch
checkpoint inside the framework (/root/reference/pseudo-lidar/
DepthPipeline.py:122-127). This entry point produces a self-contained
`jax.export` artifact (weights baked in) that any JAX/PjRt runtime can
execute on TPU or CPU without the model code or checkpoint format.

Usage:
  python -m unsupervised_pseuso_lidar_tpu.cli.export \
      --config configs/basic_config.yaml --out artifacts/depth.stablehlo \
      [--checkpoint pretrained/model | --torch-checkpoint sfm.pth] \
      [--batch 4 | --batch-poly] [--calib KITTI/2011_09_26] [--verify]

`--format torch` (or an `--out` ending in .pth) instead writes a
reference-loadable torch training checkpoint ({epoch, dpth_mdl_state_dict,
pose_mdl_state_dict, optimizer_state_dict, loss, valid_acc},
/root/reference/trainer.py:129-152) so weights trained here drop into
reference-style torch tooling; `--format bts-serving` writes the
`{"model": module.*}` blob the reference's ROS node unpickles
(/root/reference/pseudo-lidar/DepthPipeline.py:121-127).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export depth (+ pseudo-LiDAR) serving artifact"
    )
    parser.add_argument("--config", default="configs/basic_config.yaml")
    parser.add_argument("--out", required=True, help="artifact output path")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir (default: config path)")
    parser.add_argument("--torch-checkpoint", default=None,
                        help="reference .pth checkpoint to import")
    parser.add_argument("--batch", type=int, default=1,
                        help="concrete batch size (ignored with --batch-poly)")
    parser.add_argument("--batch-poly", action="store_true",
                        help="batch-polymorphic artifact (symbolic leading dim)")
    parser.add_argument("--height", type=int, default=0,
                        help="override config image height")
    parser.add_argument("--width", type=int, default=0,
                        help="override config image width")
    parser.add_argument("--platforms", default="tpu,cpu",
                        help="comma-separated lowering platforms")
    parser.add_argument("--calib", default=None,
                        help="KITTI calib dir: fuse depth -> point cloud "
                        "into one program")
    parser.add_argument("--sparsity", type=int, default=0)
    parser.add_argument("--verify", action="store_true",
                        help="reload the artifact and check it matches the "
                        "live model on a random input (current backend)")
    parser.add_argument("--format", default=None,
                        choices=["stablehlo", "torch", "bts-serving"],
                        help="artifact format (default: stablehlo, or torch "
                        "when --out ends in .pth)")
    parser.add_argument("--epoch", type=int, default=0,
                        help="epoch tag recorded in a torch-format checkpoint")
    args = parser.parse_args(argv)
    fmt = args.format or ("torch" if args.out.endswith(".pth") else "stablehlo")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unsupervised_pseuso_lidar_tpu.pseudolidar.export import (
        batch_poly_spec,
        concrete_spec,
        export_program,
        make_depth_cloud_fn,
        make_depth_fn,
        run_exported,
    )
    from unsupervised_pseuso_lidar_tpu.train.config import load_config
    from unsupervised_pseuso_lidar_tpu.train.trainer import create_train_state

    config = load_config(args.config)
    state, depth_model, _, _ = create_train_state(
        config, jax.random.PRNGKey(config.action.random_seed)
    )
    from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
        load_serving_weights,
    )

    params, batch_stats, weight_source = load_serving_weights(
        config, state,
        torch_checkpoint=args.torch_checkpoint, checkpoint=args.checkpoint,
    )

    import os

    if fmt == "torch":
        from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
            export_reference_checkpoint,
        )

        if args.torch_checkpoint:
            from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
                load_torch_checkpoint,
            )

            # .npz blobs (ImageNet encoder inits) never carry pose weights
            pose_trained = (
                not args.torch_checkpoint.endswith(".npz")
                and "pose_mdl_state_dict"
                in load_torch_checkpoint(args.torch_checkpoint)
            )
        else:
            pose_trained = weight_source not in (None, "init (untrained)")
        if not pose_trained:
            # a reference-side resume of this .pth would pick up random
            # pose weights under trusted provenance — say so loudly
            print(
                "WARNING: pose_mdl_state_dict in the exported checkpoint is "
                "RANDOM INIT (weight source carries no pose weights); do not "
                "resume reference-side training from it without retraining "
                "the pose net"
            )
        export_reference_checkpoint(
            params, batch_stats,
            config.model.depth.name, config.model.pose.name, args.out,
            epoch=args.epoch, lr=config.action.optimizer.depth_lr,
        )
        print(
            f"wrote {args.out} ({os.path.getsize(args.out)} bytes, "
            f"reference .pth schema, weights={weight_source})"
        )
        return None
    if fmt == "bts-serving":
        if config.model.depth.name != "BtsModel":
            parser.error("--format bts-serving requires model.depth.name: "
                         f"BtsModel (config has {config.model.depth.name})")
        from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
            export_bts_serving_checkpoint,
        )

        export_bts_serving_checkpoint(
            params["depth"], batch_stats["depth"], args.out
        )
        print(
            f"wrote {args.out} ({os.path.getsize(args.out)} bytes, "
            f"BTS serving blob, weights={weight_source})"
        )
        return None

    height, width = config.image_shape
    height = args.height or height
    width = args.width or width

    depth_vars = {
        "params": params["depth"], "batch_stats": batch_stats["depth"]
    }
    fn = make_depth_fn(
        depth_model, depth_vars,
        metric_output=(config.model.depth.name == "BtsModel"),
    )
    if args.calib:
        from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
            PseudoLiDAR,
        )

        fn = make_depth_cloud_fn(
            fn, PseudoLiDAR(args.calib, sparsity=args.sparsity)
        )

    example = jnp.zeros((max(args.batch, 1), height, width, 3), jnp.float32)
    spec = batch_poly_spec(example) if args.batch_poly else concrete_spec(example)
    exported = export_program(
        fn, [spec], args.out,
        platforms=[p.strip() for p in args.platforms.split(",") if p.strip()],
        metadata={
            "model": config.model.depth.name,
            "image_height": height,
            "image_width": width,
            "fused_pointcloud": bool(args.calib),
            "weights": weight_source,
        },
    )
    print(
        f"wrote {args.out} ({os.path.getsize(args.out)} bytes, "
        f"platforms={list(exported.platforms)}, "
        f"inputs={[str(a.shape) for a in exported.in_avals]})"
    )

    if args.verify:
        rng = np.random.default_rng(0)
        img = jnp.asarray(
            rng.uniform(-1, 1, (max(args.batch, 1), height, width, 3)),
            jnp.float32,
        )
        got = run_exported(args.out, img)
        want = jax.jit(fn)(img)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            ),
            got, want,
        )
        print("verify OK: artifact matches the live model")
    return exported


if __name__ == "__main__":
    main()
