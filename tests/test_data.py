"""KITTI data-pipeline tests over a synthesized mini-KITTI directory tree
(the on-disk fixture replaces real KITTI, SURVEY.md §4 "synthetic-dataset
fixture")."""

import os

import numpy as np
import pytest

from unsupervised_pseuso_lidar_tpu.data.kitti import (
    UnSupKittiDataset,
    UnSupStackedDataset,
    collate,
    find_calib_dir,
    oxts_path_for_image,
)
from unsupervised_pseuso_lidar_tpu.data.pipeline import prefetch_to_device
from unsupervised_pseuso_lidar_tpu.data.splits import kitti_depth_annotated_prepare
from unsupervised_pseuso_lidar_tpu.train.config import Config

DATE = "2011_09_26"
DRIVE = f"{DATE}_drive_0001_sync"
NUM_FRAMES = 7
IMG_W, IMG_H = 40, 30


def _write_calib(date_dir):
    k = "7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 1.000000e+00"
    p = "7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03"
    r = "9.999239e-01 9.837760e-03 -7.445048e-03 -9.869795e-03 9.999421e-01 -4.278459e-03 7.402527e-03 4.351614e-03 9.999631e-01"
    with open(os.path.join(date_dir, "calib_cam_to_cam.txt"), "w") as f:
        f.write(f"K_02: {k}\nP_rect_02: {p}\nR_rect_02: {r}\n")
    with open(os.path.join(date_dir, "calib_velo_to_cam.txt"), "w") as f:
        f.write(
            "R: 7.533745e-03 -9.999714e-01 -6.166020e-04 1.480249e-02 "
            "7.280733e-04 -9.998902e-01 9.998621e-01 7.523790e-03 1.480755e-02\n"
            "T: -4.069766e-03 -7.631618e-02 -2.717806e-01\n"
        )
    with open(os.path.join(date_dir, "calib_imu_to_velo.txt"), "w") as f:
        f.write(
            "R: 9.999976e-01 7.553071e-04 -2.035826e-03 -7.854027e-04 "
            "9.998898e-01 -1.482298e-02 2.024406e-03 1.482454e-02 9.998881e-01\n"
            "T: -8.086759e-01 3.195559e-01 -7.997231e-01\n"
        )


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("KITTI")
    date_dir = root / DATE
    img_dir = date_dir / DRIVE / "image_02" / "data"
    oxts_dir = date_dir / DRIVE / "oxts" / "data"
    img_dir.mkdir(parents=True)
    oxts_dir.mkdir(parents=True)
    _write_calib(str(date_dir))

    rng = np.random.default_rng(0)
    for i in range(NUM_FRAMES):
        arr = (rng.uniform(0, 255, (IMG_H, IMG_W, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.png")
        # OXTS: slowly moving east, constant heading. Fields: lat lon alt
        # roll pitch yaw + 23 others (zeros/flags).
        lat, lon, alt = 49.0, 8.43 + i * 1e-6, 114.5
        rest = " ".join(["0.0"] * 17) + " 0.0 0.0 1 4 5 6 7"
        (oxts_dir / f"{i:010d}.txt").write_text(
            f"{lat} {lon} {alt} 0.01 0.005 0.3 {rest}\n"
        )

    # velodyne scans whose points project INSIDE the (tiny) image: pick
    # pixel/depth targets in the rectified camera frame and pull them back
    # through inv(R_rect @ T_velo_cam) into the velodyne frame
    from unsupervised_pseuso_lidar_tpu.geometry.calibration import Calibration

    calib = Calibration(str(date_dir))
    velo_dir = date_dir / DRIVE / "velodyne_points" / "data"
    velo_dir.mkdir(parents=True)
    velo_to_rect = calib.R_rect @ calib.T_velo_cam
    rect_to_velo = np.linalg.inv(velo_to_rect)
    fx, cx = calib.P[0, 0], calib.P[0, 2]
    fy, cy = calib.P[1, 1], calib.P[1, 2]
    for i in range(NUM_FRAMES):
        pts = []
        for u, v, z in [(5, 5, 10.0), (20, 15, 25.0), (35, 25, 60.0)]:
            x = (u - cx) * z / fx - calib.P[0, 3] / fx
            y = (v - cy) * z / fy - calib.P[1, 3] / fy
            rect = np.array([x, y, z, 1.0])
            pts.append((rect_to_velo @ rect)[:3])
        scan = np.concatenate(
            [np.asarray(pts, dtype=np.float32),
             np.ones((3, 1), dtype=np.float32)], axis=1
        )
        scan.tofile(velo_dir / f"{i:010d}.bin")

    # depth_annotated tree for split prep + GT
    depth_root = tmp_path_factory.mktemp("data_depth_annotated")
    gt_dir = (
        depth_root / "train" / DRIVE / "proj_depth" / "groundtruth" / "image_02"
    )
    gt_dir.mkdir(parents=True)
    for i in range(1, NUM_FRAMES - 1):
        depth = (rng.uniform(0, 80 * 256, (IMG_H, IMG_W))).astype(np.uint16)
        Image.fromarray(depth).save(gt_dir / f"{i:010d}.png")

    return {"kitti": str(root), "depth": str(depth_root)}


def _config(split_path, root=""):
    return Config.from_dict(
        {
            "datasets": {
                "path": root,
                "split": split_path,
                "augmentation": {"image_width": 32, "image_height": 24},
                "sequence_length": 3,
            },
            "action": {"batch_size": 2},
        }
    )


class TestPathParsing:
    def test_find_calib_dir(self):
        path = "/data/KITTI/2011_09_26/2011_09_26_drive_0001_sync/image_02/data/0000000005.png"
        assert find_calib_dir(path) == "/data/KITTI/2011_09_26"

    def test_oxts_path(self):
        path = "/k/2011_09_26/d_sync/image_02/data/0000000005.png"
        assert oxts_path_for_image(path) == "/k/2011_09_26/d_sync/oxts/data/0000000005.txt"


class TestSplitPrep:
    def test_prepare_and_load(self, mini_kitti, tmp_path):
        split_path = str(tmp_path / "split.txt")
        lines = kitti_depth_annotated_prepare(
            mini_kitti["kitti"], mini_kitti["depth"], split_path, ref_offset=1
        )
        # frames 1..5 all have +-1 neighbors
        assert len(lines) == NUM_FRAMES - 2
        dataset = UnSupKittiDataset(_config(split_path))
        assert len(dataset) == NUM_FRAMES - 2

        item = dataset[0]
        assert item["tgt"].shape == (24, 32, 3)
        assert item["ref_imgs"].shape == (2, 24, 32, 3)
        assert item["intrinsics"].shape == (3, 3)
        assert item["oxts"].shape == (2, 6)
        assert item["groundtruth"].shape == (24, 32)
        # intrinsics rescaled from 40x30 original to 32x24
        np.testing.assert_allclose(
            item["intrinsics"][0, 0], 721.5377 * 32 / IMG_W, rtol=1e-5
        )
        # oxts: eastward motion at constant heading -> nonzero
        # camera-frame translation, ~zero axis-angle rotation (the
        # warp-convention 6-vec, geometry/oxts.relative_pose_6dof; the
        # reference zeroed the block outright, dataloaders.py:116)
        np.testing.assert_allclose(item["oxts"][:, :3], 0.0, atol=1e-5)
        assert abs(item["oxts"][:, 3:]).max() > 0
        # tgt->ref direction: ref0 (earlier, west of tgt) and ref1
        # (later, east) sit on opposite sides, so the two translations
        # point opposite ways
        dots = float(np.dot(item["oxts"][0, 3:], item["oxts"][1, 3:]))
        assert dots < 0

    def test_ref_offset_respected(self, mini_kitti, tmp_path):
        split_path = str(tmp_path / "split3.txt")
        lines = kitti_depth_annotated_prepare(
            mini_kitti["kitti"], mini_kitti["depth"], split_path, ref_offset=3
        )
        # only frames 3 has +-3 neighbors within 0..6 -> frames 3 only
        assert len(lines) == 1
        assert "0000000000.png" in lines[0] and "0000000006.png" in lines[0]


class TestBatching:
    def test_batches_and_split(self, mini_kitti, tmp_path):
        split_path = str(tmp_path / "split.txt")
        kitti_depth_annotated_prepare(
            mini_kitti["kitti"], mini_kitti["depth"], split_path
        )
        dataset = UnSupKittiDataset(_config(split_path))
        train_idx, val_idx = dataset.train_val_indices(seed=42, val_ratio=0.4)
        assert len(val_idx) == 2 and len(train_idx) == 3
        # deterministic
        t2, v2 = dataset.train_val_indices(seed=42, val_ratio=0.4)
        assert train_idx == t2 and val_idx == v2

        batches = list(dataset.batches(train_idx, batch_size=2, num_workers=2))
        assert len(batches) == 1  # drop_last
        assert batches[0]["tgt"].shape == (2, 24, 32, 3)

    def test_with_groundtruth_false_skips_gt(self, mini_kitti, tmp_path):
        # training consumers pass with_groundtruth=False: GT (incl. the
        # JAX-dispatching velodyne rasterizer) must not be materialized
        split_path = str(tmp_path / "split.txt")
        kitti_depth_annotated_prepare(
            mini_kitti["kitti"], mini_kitti["depth"], split_path
        )
        dataset = UnSupKittiDataset(_config(split_path))
        idx = list(range(len(dataset)))
        with_gt = next(iter(dataset.batches(idx, 2, num_workers=2)))
        assert "groundtruth" in with_gt
        no_gt = next(iter(
            dataset.batches(idx, 2, num_workers=2, with_groundtruth=False)
        ))
        assert "groundtruth" not in no_gt
        np.testing.assert_array_equal(no_gt["tgt"], with_gt["tgt"])

    def test_process_pool_batches_match_threads(self, mini_kitti, tmp_path):
        # worker_type: process (VERDICT r1 task 6) — forked decode workers
        # must yield byte-identical batches in the same order
        split_path = str(tmp_path / "split.txt")
        kitti_depth_annotated_prepare(
            mini_kitti["kitti"], mini_kitti["depth"], split_path
        )
        dataset = UnSupKittiDataset(_config(split_path))
        idx = list(range(len(dataset)))
        a = list(dataset.batches(idx, 2, num_workers=2))
        b = list(dataset.batches(idx, 2, num_workers=2, use_processes=True))
        assert len(a) == len(b) == 2
        for ba, bb in zip(a, b):
            assert ba.keys() == bb.keys()
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])

    def test_prefetch(self, mini_kitti, tmp_path):
        split_path = str(tmp_path / "split.txt")
        kitti_depth_annotated_prepare(
            mini_kitti["kitti"], mini_kitti["depth"], split_path
        )
        dataset = UnSupKittiDataset(_config(split_path))
        idx = list(range(len(dataset)))
        seen = list(
            prefetch_to_device(dataset.batches(idx, 2, num_workers=1), size=2)
        )
        assert len(seen) == 2
        assert seen[0]["tgt"].shape == (2, 24, 32, 3)

    def test_decoded_image_cache(self, mini_kitti, tmp_path):
        split_path = str(tmp_path / "split.txt")
        kitti_depth_annotated_prepare(
            mini_kitti["kitti"], mini_kitti["depth"], split_path
        )
        config = _config(split_path)
        config.datasets.cache_dir = str(tmp_path / "imgcache")
        dataset = UnSupKittiDataset(config)
        first = dataset[0]
        cached_files = os.listdir(config.datasets.cache_dir)
        assert len(cached_files) == 3  # tgt + 2 refs decoded once
        second = dataset[0]  # served from cache
        np.testing.assert_array_equal(first["tgt"], second["tgt"])
        np.testing.assert_array_equal(first["ref_imgs"], second["ref_imgs"])

    def test_chunked_device_put_matches_plain(self):
        from unsupervised_pseuso_lidar_tpu.data.pipeline import (
            chunked_device_put,
        )

        rng = np.random.default_rng(0)
        batch = {
            "big": rng.integers(0, 256, (6, 40, 50, 3)).astype(np.uint8),
            "small": rng.normal(size=(6, 3, 3)).astype(np.float32),
            "scalarish": rng.normal(size=(1, 4)).astype(np.float32),
        }
        out = chunked_device_put(batch, chunk_bytes=10_000)
        for k in batch:
            np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
        # parallel transfer streams preserve chunk order
        out2 = chunked_device_put(batch, chunk_bytes=10_000, streams=4)
        for k in batch:
            np.testing.assert_array_equal(np.asarray(out2[k]), batch[k])

    def test_prefetch_chunked(self):
        batches = [
            {"x": np.full((4, 100, 100), i, dtype=np.float32)}
            for i in range(3)
        ]
        seen = list(
            prefetch_to_device(iter(batches), size=2, chunk_bytes=50_000)
        )
        assert len(seen) == 3
        for i, b in enumerate(seen):
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    def test_prefetch_propagates_errors(self):
        def bad_iter():
            yield {"x": np.zeros(2)}
            raise RuntimeError("loader broke")

        it = prefetch_to_device(bad_iter(), size=1)
        next(it)
        with pytest.raises(RuntimeError, match="loader broke"):
            list(it)


class TestStacked:
    def test_sliding_window_dataset(self, mini_kitti):
        cfg = _config("", root=mini_kitti["kitti"])
        dataset = UnSupStackedDataset(cfg)
        # 7 frames -> 5 windows of length 3
        assert len(dataset) == NUM_FRAMES - 2
        item = dataset[0]
        assert item["tgt"].shape == (24, 32, 3)
        assert "groundtruth" not in item


class TestVeloGT:
    def test_raw_drive_split_and_velo_gt(self, mini_kitti, tmp_path):
        # VERDICT r1 task 5: any raw drive (no annotated archive) yields
        # GT metrics — split without a GT column + velodyne rasterization
        from unsupervised_pseuso_lidar_tpu.data.splits import raw_drive_split

        drive = os.path.join(mini_kitti["kitti"], DATE, DRIVE)
        split_path = str(tmp_path / "smoke.txt")
        lines = raw_drive_split(drive, split_path)
        assert len(lines) == NUM_FRAMES - 2
        assert all(len(line.split()) == 3 for line in lines)

        config = _config(split_path)
        config.datasets.velo_gt = True
        dataset = UnSupKittiDataset(config)
        item = dataset[0]
        gt = item["groundtruth"]
        assert gt.shape == (24, 32)
        # the fixture's 3 synthetic returns at depths 10/25/60 m land at
        # their target pixels (rescaled 40x30 -> 32x24)
        valid = gt[gt > 0]
        assert valid.size == 3
        np.testing.assert_allclose(sorted(valid), [10.0, 25.0, 60.0], rtol=1e-4)
        # each return lands on its target pixel up to int-truncation of
        # the projected coordinate (fp32 noise can shift one pixel)
        for (u, v, z) in [(5, 5, 10.0), (20, 15, 25.0), (35, 25, 60.0)]:
            vi, ui = int(v * 24 / 30), int(u * 32 / 40)
            patch = gt[max(vi - 1, 0) : vi + 2, max(ui - 1, 0) : ui + 2]
            assert (np.abs(patch - z) < 1e-3).any()

        # without the flag, a GT-less split has no groundtruth key
        ds2 = UnSupKittiDataset(_config(split_path))
        assert "groundtruth" not in ds2[0]

    def test_evaluate_cli_velo_gt(self, mini_kitti, tmp_path, capsys):
        # one-command smoke parity run (docs/PARITY_RUNBOOK.md §4)
        import json

        import yaml

        from unsupervised_pseuso_lidar_tpu.cli.evaluate import main as eval_main
        from unsupervised_pseuso_lidar_tpu.data.splits import raw_drive_split

        drive = os.path.join(mini_kitti["kitti"], DATE, DRIVE)
        split_path = str(tmp_path / "smoke.txt")
        raw_drive_split(drive, split_path)
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(yaml.safe_dump({
            "model": {"name": "velogt_eval",
                      "depth": {"name": "DispNetS"},
                      "pose": {"name": "PoseNet"}},
            "datasets": {"split": split_path,
                         "augmentation": {"image_width": 32,
                                          "image_height": 24}},
            "action": {"batch_size": 2, "num_workers": 1,
                       "checkpoint_dir": str(tmp_path / "ckpt")},
        }))
        metrics = eval_main([
            "--config", str(cfg_path), "--velo-gt", "--protocol", "eigen",
        ])
        out = json.loads(capsys.readouterr().out)
        assert np.isfinite(out["loss"])
        # 24x32 Garg crop keeps rows 9..23, cols 1..30: the 25 m return at
        # (12, 16) survives -> abs_rel is a real number
        assert np.isfinite(metrics["abs_rel"])
