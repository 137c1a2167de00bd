"""Training entry point.

Parity: /root/reference/train.py:1-8 (load YAML config, build Trainer,
train) with CLI overrides, mesh selection, and host-async prefetch.

Usage:
  python -m unsupervised_pseuso_lidar_tpu.cli.train --config configs/basic_config.yaml
"""

from __future__ import annotations

import argparse
from functools import partial


def main(argv=None):
    parser = argparse.ArgumentParser(description="Unsupervised depth training")
    parser.add_argument("--config", default="configs/basic_config.yaml")
    parser.add_argument("--mesh", type=int, default=0,
                        help="data-parallel devices (0 = all available)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on the synthetic scene (no KITTI needed)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the first "
                        "epoch into DIR")
    parser.add_argument("--op-breakdown", action="store_true",
                        help="after training, print per-op-family device "
                        "ms/step of one train step (utils/trace.py)")
    args = parser.parse_args(argv)

    import jax

    from unsupervised_pseuso_lidar_tpu.data.pipeline import prefetch_to_device
    from unsupervised_pseuso_lidar_tpu.parallel.mesh import make_mesh, shard_batch
    from unsupervised_pseuso_lidar_tpu.train.config import load_config
    from unsupervised_pseuso_lidar_tpu.train.trainer import Trainer
    from unsupervised_pseuso_lidar_tpu.utils.logging import MetricLogger

    config = load_config(args.config)
    if args.epochs is not None:
        config.action.num_epochs = args.epochs
    if args.batch_size is not None:
        config.action.batch_size = args.batch_size

    n_devices = args.mesh or len(jax.devices())
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    device_put = partial(shard_batch, mesh) if mesh else None

    logger = MetricLogger(config)

    import contextlib

    from unsupervised_pseuso_lidar_tpu.utils.profiling import trace

    profile_ctx = trace(args.profile) if args.profile else contextlib.nullcontext()

    if args.synthetic:
        from unsupervised_pseuso_lidar_tpu.data.synthetic import (
            SyntheticTripletDataset,
        )

        height, width = config.image_shape
        dataset = SyntheticTripletDataset(
            num_batches=50, batch_size=config.action.batch_size,
            height=height, width=width, uint8_images=True,
        )
        trainer = Trainer(config, dataset=dataset, mesh=mesh, log_fn=logger)
        with profile_ctx:
            trainer.fit(
                make_train_iter=lambda epoch: prefetch_to_device(
                    dataset.batches(epoch), device_put=device_put,
                ),
            )
        if args.op_breakdown:
            _op_breakdown_step(trainer, next(iter(dataset.batches(0))))
        return trainer

    from unsupervised_pseuso_lidar_tpu.data.kitti import UnSupKittiDataset

    try:
        dataset = UnSupKittiDataset(config)
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}") from e
    train_idx, val_idx = dataset.train_val_indices(
        seed=config.action.random_seed,
        val_ratio=config.action.split[1],
        shuffle=config.datasets.augmentation.shuffle,
    )
    trainer = Trainer(config, dataset=dataset, mesh=mesh, log_fn=logger)

    batch_size = config.action.batch_size
    workers = config.action.num_workers
    procs = config.action.worker_type == "process"

    def epoch_indices(epoch):
        # fresh permutation per epoch (seeded: run-reproducible). The
        # reference shuffles ONCE at loader build (trainer.py:177-181) and
        # replays the same batch partition every epoch; with few batches
        # per epoch the fixed groupings measurably slow convergence
        # (reference-loop scene, 16 batches/epoch: abs_rel 0.25 fixed vs
        # 0.05 reshuffled at the same 400-step budget).
        if not config.datasets.augmentation.shuffle:
            return train_idx
        import numpy as _np

        rng = _np.random.default_rng(
            config.action.random_seed + 1_000_003 * (epoch + 1)
        )
        return [int(i) for i in rng.permutation(train_idx)]

    with profile_ctx:
        trainer.fit(
            make_train_iter=lambda epoch: prefetch_to_device(
                # train batches carry GT only when the supervised term
                # consumes it (action.supervised_weight); otherwise
                # skipping it avoids decoding / rasterizing GT that is
                # thrown away, sample by sample
                dataset.batches(
                    epoch_indices(epoch), batch_size, workers,
                    use_processes=procs,
                    with_groundtruth=bool(config.action.supervised_weight),
                ),
                device_put=device_put,
            ),
            make_val_iter=lambda: dataset.batches(val_idx, batch_size, workers),
        )
    if args.op_breakdown:
        _op_breakdown_step(
            trainer,
            next(iter(dataset.batches(
                train_idx, batch_size, workers,
                with_groundtruth=bool(config.action.supervised_weight),
            ))),
        )
    return trainer


def _op_breakdown_step(trainer, batch) -> None:
    """Print the per-op-family device time of one jitted train step."""
    from unsupervised_pseuso_lidar_tpu.utils.trace import op_breakdown

    # keep GT when the supervised term is active so the profiled program
    # IS the trained program (not an unsupervised-only retrace)
    device_batch = trainer._device_batch(
        batch,
        keep_groundtruth=bool(trainer.config.action.supervised_weight),
    )

    def run_step():  # rebind state: the jitted step donates its input state
        trainer.state, metrics = trainer.train_step(trainer.state, device_batch)
        return metrics

    op_breakdown(run_step, steps=3)


if __name__ == "__main__":
    main()
