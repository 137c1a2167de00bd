"""CLI integration tests: train -> evaluate -> inference over the
synthesized mini-KITTI tree (the full reference workflow,
train.py / evaluate.py / inference.py, end to end)."""

import json
import os

import numpy as np
import pytest
import yaml

from tests.test_data import DATE, DRIVE, IMG_H, IMG_W, NUM_FRAMES, mini_kitti  # noqa: F401
from unsupervised_pseuso_lidar_tpu.data.splits import kitti_depth_annotated_prepare


@pytest.fixture()
def cli_config(mini_kitti, tmp_path):  # noqa: F811
    split_path = str(tmp_path / "split.txt")
    kitti_depth_annotated_prepare(
        mini_kitti["kitti"], mini_kitti["depth"], split_path
    )
    config = {
        "model": {
            "name": "cli_test",
            "depth": {"name": "StnDispNet"},
            "pose": {"name": "PoseNet"},
        },
        "datasets": {
            "path": mini_kitti["kitti"],
            "split": split_path,
            "augmentation": {"image_width": 32, "image_height": 32, "shuffle": True},
            "sequence_length": 3,
        },
        "action": {
            "batch_size": 2,
            "num_epochs": 1,
            "num_workers": 2,
            "log_freq": 1,
            "split": [0.6, 0.4],
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "optimizer": {"depth": {"lr": 1e-4}, "pose": {"lr": 1e-4}},
            "scheduler": {"step_size": 30, "gamma": 0.1},
        },
    }
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(config))
    return str(path)


def test_train_then_evaluate_then_inference(cli_config, mini_kitti, tmp_path, capsys):  # noqa: F811
    from unsupervised_pseuso_lidar_tpu.cli import evaluate as eval_cli
    from unsupervised_pseuso_lidar_tpu.cli import inference as infer_cli
    from unsupervised_pseuso_lidar_tpu.cli import train as train_cli

    trainer = train_cli.main(["--config", cli_config, "--mesh", "1"])
    assert trainer.checkpoints.latest_epoch() == 0

    metrics = eval_cli.main(
        ["--config", cli_config, "--max-batches", "1", "--pose-metrics"]
    )
    for key in ("abs_rel", "rms", "d1", "pose_ate", "pose_rot_err_deg"):
        assert key in metrics and np.isfinite(metrics[key])

    img = os.path.join(
        mini_kitti["kitti"], DATE, DRIVE, "image_02", "data", "0000000001.png"
    )
    out = str(tmp_path / "depth.npy")
    depth = infer_cli.main(
        ["--config", cli_config, "--image", img, "--output", out,
         "--calib", os.path.join(mini_kitti["kitti"], DATE)]
    )
    assert depth.shape == (32, 32)
    assert os.path.exists(out)

    # the TRAINED checkpoint ships as a serving artifact: export restores
    # the epoch-0 orbax state and --verify reloads the artifact and
    # checks it against the live model — closing the train -> serve loop
    from unsupervised_pseuso_lidar_tpu.cli import export as export_cli

    artifact = str(tmp_path / "depth.stablehlo")
    exported = export_cli.main([
        "--config", cli_config, "--out", artifact,
        "--checkpoint", str(tmp_path / "ckpt" / "cli_test"),
        "--height", "32", "--width", "32",
        "--platforms", "cpu", "--verify",
    ])
    assert os.path.exists(artifact)
    assert [str(a.shape) for a in exported.in_avals] == ["(1, 32, 32, 3)"]


def test_odometry_cli(cli_config, mini_kitti, tmp_path):  # noqa: F811
    from unsupervised_pseuso_lidar_tpu.cli import odometry as odo_cli

    out = str(tmp_path / "poses.txt")
    gt_out = str(tmp_path / "gt_poses.txt")
    metrics = odo_cli.main(
        ["--config", cli_config, "--out", out, "--gt-out", gt_out]
    )
    # one drive of NUM_FRAMES images -> NUM_FRAMES trajectory rows
    # (N-2 sliding windows; identity row + camera-1 pose + the chain)
    lines = open(out).read().strip().splitlines()
    assert len(lines) == NUM_FRAMES
    assert all(len(line.split()) == 12 for line in lines)
    first = np.asarray(lines[0].split(), dtype=float).reshape(3, 4)
    np.testing.assert_allclose(first, np.eye(4)[:3], atol=1e-9)
    gt_lines = open(gt_out).read().strip().splitlines()
    assert len(gt_lines) == NUM_FRAMES
    # GT trajectory integrates real OXTS motion: not all rows identical
    assert len(set(gt_lines)) > 1
    assert metrics["frames"] == NUM_FRAMES
    assert np.isfinite(metrics["pose_ate"])


def test_odometry_cli_multi_drive(cli_config, mini_kitti, tmp_path):  # noqa: F811
    # two drives must yield two per-drive trajectory files, never one
    # chain composed across recordings
    import shutil

    import yaml

    root = tmp_path / "kitti2"
    shutil.copytree(mini_kitti["kitti"], root)
    src = root / DATE / DRIVE
    shutil.copytree(src, root / DATE / f"{DATE}_drive_0002_sync")

    from unsupervised_pseuso_lidar_tpu.cli import odometry as odo_cli

    config = yaml.safe_load(open(cli_config))
    config["datasets"]["path"] = str(root)
    cfg2 = tmp_path / "config2.yaml"
    cfg2.write_text(yaml.safe_dump(config))

    out = str(tmp_path / "poses.txt")
    metrics = odo_cli.main(["--config", str(cfg2), "--out", out])
    assert metrics["drives"] == 2
    assert metrics["frames"] == 2 * NUM_FRAMES
    assert not os.path.exists(out)  # multi-drive -> suffixed files
    assert os.path.exists(str(tmp_path / f"poses_{DRIVE}.txt"))
    assert os.path.exists(
        str(tmp_path / f"poses_{DATE}_drive_0002_sync.txt")
    )


def test_splits_cli(mini_kitti, tmp_path):  # noqa: F811
    from unsupervised_pseuso_lidar_tpu.cli import splits as splits_cli

    out = str(tmp_path / "ann.txt")
    lines = splits_cli.main(
        ["annotated", "--kitti", mini_kitti["kitti"],
         "--depth", mini_kitti["depth"], "--out", out]
    )
    assert lines and os.path.exists(out)
    assert all(len(line.split()) == 4 for line in lines)

    drive = os.path.join(mini_kitti["kitti"], DATE, DRIVE)
    out2 = str(tmp_path / "drv.txt")
    lines2 = splits_cli.main(["drive", "--drive", drive, "--out", out2])
    assert lines2 and all(len(line.split()) == 3 for line in lines2)


def test_pipeline_cli_multi_camera(cli_config, mini_kitti, tmp_path, capsys):  # noqa: F811
    """camera->depth->cloud CLI over a 2-camera rig: one fused batch-2
    program per rig step, per-camera cloud files, rig-step JSON stats —
    serving the --config's depth model through the shared
    weight-resolution path."""
    import pytest

    from unsupervised_pseuso_lidar_tpu.cli.pipeline import main

    img_dir = os.path.join(mini_kitti["kitti"], DATE, DRIVE, "image_02", "data")
    calib = os.path.join(mini_kitti["kitti"], DATE)

    # checkpoint flags without --config cannot resolve an architecture
    with pytest.raises(SystemExit, match="need --config"):
        main(["--images", img_dir, "--calib", calib,
              "--checkpoint", str(tmp_path / "ckpt")])

    # @file configs in the reference's one-'--flag value'-per-line layout
    # (mock_publisher.py:23-24, config_test.txt) parse identically
    argfile = tmp_path / "pipeline_args.txt"
    argfile.write_text(
        f"--images {img_dir}\n--calib {calib}\n--checkpoint bogus\n"
    )
    with pytest.raises(SystemExit, match="need --config"):
        main([f"@{argfile}"])

    save = tmp_path / "clouds"
    main([
        "--images", img_dir, img_dir,
        "--calib", calib,
        "--config", cli_config,
        "--height", "32", "--width", "32",
        "--max-frames", "2",
        "--queue-size", "8",
        "--save-dir", str(save),
        "--format", "bin",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 2 and stats["streams"] == 2
    files = sorted(os.listdir(save))
    assert files == [
        "cloud_cam0_000000.bin", "cloud_cam0_000001.bin",
        "cloud_cam1_000000.bin", "cloud_cam1_000001.bin",
    ]
    # .bin = the KITTI velodyne wire format: our own scan loader reads it
    from unsupervised_pseuso_lidar_tpu.geometry.oxts import load_velo_scan

    cloud = load_velo_scan(str(save / files[0]))
    assert cloud.ndim == 2 and cloud.shape[1] == 4


def test_bench_entry_smoke(capsys):
    """bench.py (the driver's round-end entry) prints one valid JSON row.

    Tiny shapes + gather warp + unroll 1 keep the CPU compile small; the
    contract under test is the output schema and that the whole
    state/step/measure path executes."""
    import bench

    fps = bench.main(
        ["--batch", "1", "--height", "32", "--width", "64",
         "--steps", "1", "--warmup", "1", "--unroll", "1",
         "--fp32", "--warp", "gather", "--depth-model", "StnDispNet"]
    )
    assert fps > 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    row = json.loads(out)
    assert row["unit"] == "frames/sec/chip"
    assert row["value"] > 0
    assert "vs_baseline" in row and np.isfinite(row["vs_baseline"])
    assert row["metric"].startswith("train_fps_depth_pose_warp_b1")


def test_train_synthetic_flag(tmp_path):
    from unsupervised_pseuso_lidar_tpu.cli import train as train_cli

    config = {
        "model": {
            "name": "syn_cli",
            "depth": {"name": "StnDispNet"},
            "pose": {"name": "PoseNet"},
        },
        "datasets": {
            "augmentation": {"image_width": 32, "image_height": 32},
            "sequence_length": 3,
        },
        "action": {
            "batch_size": 2,
            "num_epochs": 1,
            "log_freq": 100,
            "checkpoint_dir": str(tmp_path / "ckpt"),
        },
    }
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(config))
    trainer = train_cli.main(["--config", str(path), "--synthetic", "--mesh", "1"])
    assert trainer is not None
