"""Pseudo-LiDAR layer tests: backprojection round trips, crop/sparsity
semantics, scatter rasterization, and the streaming pipeline."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
    PseudoLiDAR,
    depth_to_pointcloud,
)
from unsupervised_pseuso_lidar_tpu.pseudolidar.velo2img import (
    project_img_to_velo,
    project_velo_to_depth_image,
)

# Real KITTI 2011_09_26 calibration values.
P = np.array(
    [
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ],
    dtype=np.float32,
)
T_VELO_CAM = np.array(
    [
        [7.533745e-03, -9.999714e-01, -6.166020e-04, -4.069766e-03],
        [1.480249e-02, 7.280733e-04, -9.998902e-01, -7.631618e-02],
        [9.998621e-01, 7.523790e-03, 1.480755e-02, -2.717806e-01],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


class TestDepthToPointcloud:
    def test_shapes_and_mask(self):
        depth = jnp.full((2, 8, 16), 10.0)
        points, valid = depth_to_pointcloud(depth, jnp.asarray(P), jnp.asarray(T_VELO_CAM))
        assert points.shape == (2, 128, 4)
        assert valid.shape == (2, 128)
        assert valid.dtype == jnp.bool_

    def test_zero_depth_pixels_invalid(self):
        # Sparse depth images (velodyne rasterizations) are mostly zeros;
        # a zero-depth pixel backprojects to the camera origin, which
        # passes the x>=0/height crops — it must be masked out, or the
        # cloud floods with phantom points at the sensor.
        depth = jnp.zeros((1, 8, 16)).at[0, 4, 8].set(10.0)
        _, valid = depth_to_pointcloud(
            depth, jnp.asarray(P), jnp.asarray(T_VELO_CAM)
        )
        assert int(valid.sum()) <= 1
        # toy camera centered on the tiny grid, velo == cam frame: pixels
        # right of the principal point have x >= 0, depth 0.5 < height
        # crop -> exactly half the grid is a real return
        p_small = jnp.asarray(
            [[10.0, 0, 8.0, 0], [0, 10.0, 4.0, 0], [0, 0, 1.0, 0]],
            jnp.float32,
        )
        eye = jnp.eye(4, dtype=jnp.float32)
        full = jnp.full((1, 8, 16), 0.5)
        _, valid_full = depth_to_pointcloud(full, p_small, eye)
        # the zero-mask must not eat real returns (u >= cu: 8 of 16 cols)
        assert int(valid_full.sum()) == 8 * 8
        # same camera, zero depth everywhere: before the depth>0 mask all
        # 128 pixels backprojected to the origin and PASSED the crops
        _, valid_zero = depth_to_pointcloud(jnp.zeros((1, 8, 16)), p_small, eye)
        assert int(valid_zero.sum()) == 0

    def test_pinhole_formula(self):
        # Camera-frame x of pixel (u, v): (u - cu) * d / fu + bx.
        depth = jnp.full((1, 4, 4), 20.0)
        points, _ = depth_to_pointcloud(depth, jnp.asarray(P), jnp.asarray(T_VELO_CAM))
        # invert back to camera frame: velo->cam applied to point 0 (u=0, v=0)
        cam = T_VELO_CAM @ np.array([*np.asarray(points[0, 0])[:3], 1.0])
        expect_x = (0 - P[0, 2]) * 20.0 / P[0, 0] + P[0, 3] / (-P[0, 0])
        expect_y = (0 - P[1, 2]) * 20.0 / P[1, 1] + P[1, 3] / (-P[1, 1])
        np.testing.assert_allclose(cam[:3], [expect_x, expect_y, 20.0], atol=1e-3)

    def test_height_crop(self):
        # Very close depth -> points high above the sensor get cropped.
        depth_near = jnp.full((1, 8, 16), 2.0)
        _, valid_near = depth_to_pointcloud(
            depth_near, jnp.asarray(P), jnp.asarray(T_VELO_CAM), max_high=-100.0
        )
        assert not bool(valid_near.any())  # impossible crop removes all
        _, valid_all = depth_to_pointcloud(
            depth_near, jnp.asarray(P), jnp.asarray(T_VELO_CAM), max_high=1e9
        )
        assert bool(valid_all.any())

    def test_sparsity_halves_points(self):
        depth = jnp.full((1, 16, 16), 10.0)
        _, valid0 = depth_to_pointcloud(depth, jnp.asarray(P), jnp.asarray(T_VELO_CAM))
        _, valid2 = depth_to_pointcloud(
            depth, jnp.asarray(P), jnp.asarray(T_VELO_CAM), sparsity=2
        )
        n0 = int(valid0.sum())
        n2 = int(valid2.sum())
        assert abs(n2 - n0 / 2) <= 1

    def test_intensity_column_zero(self):
        depth = jnp.full((1, 4, 4), 10.0)
        points, _ = depth_to_pointcloud(depth, jnp.asarray(P), jnp.asarray(T_VELO_CAM))
        np.testing.assert_allclose(np.asarray(points[..., 3]), 0.0)


class TestVelo2Img:
    def test_roundtrip_velo_img_velo(self):
        # Project a synthetic forward-facing cloud to a depth image and back.
        rng = np.random.default_rng(0)
        n = 500
        cloud = np.stack(
            [
                rng.uniform(5, 40, n),     # x forward
                rng.uniform(-5, 5, n),     # y left
                rng.uniform(-1.5, 0.5, n), # z up (below sensor)
            ],
            axis=-1,
        ).astype(np.float32)
        img = project_velo_to_depth_image(
            jnp.asarray(cloud), jnp.asarray(T_VELO_CAM), jnp.asarray(P),
            width=1242, height=375,
        )
        img_np = np.asarray(img)
        valid_px = (img_np > 0).sum()
        assert valid_px > 100  # most points land in the image
        back = project_img_to_velo(img_np, T_VELO_CAM, P)
        assert back.shape[1] == 4
        assert np.isfinite(back).all()
        # reconstructed forward-facing points stay in the original x range
        fwd = back[back[:, 0] > 1.0]
        assert fwd.shape[0] >= valid_px * 0.5
        assert fwd[:, 0].max() < 45.0

    def test_rasterize_keeps_nearest(self):
        # Two points projecting to the same pixel: nearest depth wins.
        base = np.array([10.0, 0.0, 0.0], dtype=np.float32)
        far = base * 3
        img = project_velo_to_depth_image(
            jnp.asarray(np.stack([far, base])),
            jnp.asarray(T_VELO_CAM),
            jnp.asarray(P),
            width=1242,
            height=375,
        )
        vals = np.asarray(img)
        nz = vals[vals > 0]
        assert len(nz) >= 1
        cam_near = (T_VELO_CAM @ np.array([*base, 1.0]))[2]
        assert abs(nz.min() - cam_near) < 0.5


class TestPseudoLiDARClass:
    @pytest.fixture
    def calib_dir(self, tmp_path):
        # small-camera calibration sized for a 16x32 test image (a full-size
        # KITTI principal point would put every tiny-image pixel above the
        # horizon and the height crop would empty the cloud)
        k = "100 0 16 0 100 8 0 0 1"
        p = "100 0 16 0.5 0 100 8 0.01 0 0 1 0"
        r = "1 0 0 0 1 0 0 0 1"
        (tmp_path / "calib_cam_to_cam.txt").write_text(
            f"K_02: {k}\nP_rect_02: {p}\nR_rect_02: {r}\n"
        )
        (tmp_path / "calib_velo_to_cam.txt").write_text(
            "R: 7.533745e-03 -9.999714e-01 -6.166020e-04 1.480249e-02 "
            "7.280733e-04 -9.998902e-01 9.998621e-01 7.523790e-03 1.480755e-02\n"
            "T: -4.069766e-03 -7.631618e-02 -2.717806e-01\n"
        )
        (tmp_path / "calib_imu_to_velo.txt").write_text(
            "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n"
        )
        return str(tmp_path)

    def test_project_pl_api(self, calib_dir):
        pl = PseudoLiDAR(calib_dir, sparsity=0)
        depth = np.full((16, 32), 15.0, dtype=np.float32)
        cloud = pl.project_PL(depth)
        assert cloud.ndim == 2 and cloud.shape[1] == 4
        assert cloud.shape[0] > 0
        # all surviving points respect the crop
        assert (cloud[:, 0] >= 0).all() and (cloud[:, 2] < 1.0).all()


class TestStreamingPipeline:
    def test_file_source_and_pipeline(self, tmp_path):
        from PIL import Image

        from unsupervised_pseuso_lidar_tpu.pseudolidar.pipeline import (
            DepthToPointCloudPipeline,
            FileImageSource,
        )

        img_dir = tmp_path / "frames"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            Image.fromarray(
                rng.uniform(0, 255, (16, 32, 3)).astype(np.uint8)
            ).save(img_dir / f"{i:06d}.png")

        calib = tmp_path / "calib"
        calib.mkdir()
        (calib / "calib_cam_to_cam.txt").write_text(
            "K_02: 100 0 16 0 100 8 0 0 1\n"
            "P_rect_02: 100 0 16 0 0 100 8 0 0 0 1 0\n"
            "R_rect_02: 1 0 0 0 1 0 0 0 1\n"
        )
        (calib / "calib_velo_to_cam.txt").write_text(
            "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n"
        )
        (calib / "calib_imu_to_velo.txt").write_text("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")

        def fake_depth_fn(img):
            return jnp.full(img.shape[:3], 12.0)

        pipeline = DepthToPointCloudPipeline(
            fake_depth_fn, PseudoLiDAR(str(calib))
        )
        results = []
        processed = pipeline.run(
            FileImageSource(str(img_dir), size_hw=(16, 32)),
            results.append,
            queue_size=8,
        )
        assert processed == 3
        assert results[0].depth.shape == (16, 32)
        assert results[0].points.shape[1] == 4
        assert results[0].points.shape[0] > 0

    def test_multi_camera_rig(self, tmp_path):
        # 3 synchronized cameras, 2 rig steps: each step runs ONE fused
        # batch-3 program and emits one result per stream; clouds must
        # match the single-stream path on the same frames
        from PIL import Image

        from unsupervised_pseuso_lidar_tpu.pseudolidar.pipeline import (
            DepthToPointCloudPipeline,
            FileImageSource,
        )

        rng = np.random.default_rng(1)
        cam_dirs = []
        for cam in range(3):
            d = tmp_path / f"cam{cam}"
            d.mkdir()
            for i in range(2):
                Image.fromarray(
                    rng.uniform(0, 255, (16, 32, 3)).astype(np.uint8)
                ).save(d / f"{i:06d}.png")
            cam_dirs.append(str(d))

        calib = tmp_path / "calib"
        calib.mkdir()
        (calib / "calib_cam_to_cam.txt").write_text(
            "K_02: 100 0 16 0 100 8 0 0 1\n"
            "P_rect_02: 100 0 16 0 0 100 8 0 0 0 1 0\n"
            "R_rect_02: 1 0 0 0 1 0 0 0 1\n"
        )
        (calib / "calib_velo_to_cam.txt").write_text(
            "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n"
        )
        (calib / "calib_imu_to_velo.txt").write_text(
            "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n"
        )

        def fake_depth_fn(img):
            # depth varies with image content so streams differ
            return 10.0 + 5.0 * jnp.mean(img, axis=(1, 2, 3))[:, None, None] \
                * jnp.ones(img.shape[:3])

        pipeline = DepthToPointCloudPipeline(
            fake_depth_fn, PseudoLiDAR(str(calib))
        )
        results = []
        steps = pipeline.run_multi(
            [iter(FileImageSource(d, size_hw=(16, 32))) for d in cam_dirs],
            results.append,
            queue_size=8,
        )
        assert steps == 2
        assert len(results) == 6
        assert sorted({r.stream_index for r in results}) == [0, 1, 2]
        assert {r.frame_index for r in results} == {0, 1}
        # per-stream results equal the b1 path on the same frame
        from unsupervised_pseuso_lidar_tpu.utils.transforms import load_image

        frame00, _, _ = load_image(
            os.path.join(cam_dirs[1], "000000.png"), (16, 32)
        )
        single = pipeline.process(frame00, 0)
        multi = [r for r in results if r.stream_index == 1 and r.frame_index == 0][0]
        np.testing.assert_allclose(single.depth, multi.depth, rtol=1e-6)
        np.testing.assert_allclose(single.points, multi.points, rtol=1e-6)

        # a source that raises mid-stream must terminate the loop with
        # that exception, not hang the consumer on an empty queue
        def bad_source():
            yield np.zeros((16, 32, 3), np.float32)
            raise RuntimeError("corrupt frame")

        seen = []
        with pytest.raises(RuntimeError, match="corrupt frame"):
            pipeline.run(bad_source(), seen.append, queue_size=8)
        assert len(seen) == 1  # the good frame was still processed
        with pytest.raises(RuntimeError, match="corrupt frame"):
            pipeline.run_multi(
                [bad_source(), bad_source()], seen.append, queue_size=8
            )


class TestVeloGT:
    def test_depth_gt_from_velo(self, tmp_path):
        # synthetic forward-facing scan -> sparse GT depth image
        from unsupervised_pseuso_lidar_tpu.data.velo_gt import (
            depth_gt_from_velo,
            velo_path_for_image,
        )
        from unsupervised_pseuso_lidar_tpu.geometry.calibration import Calibration

        k = "100 0 64 0 100 32 0 0 1"
        p = "100 0 64 0 0 100 32 0 0 0 1 0"
        r = "1 0 0 0 1 0 0 0 1"
        (tmp_path / "calib_cam_to_cam.txt").write_text(
            f"K_02: {k}\nP_rect_02: {p}\nR_rect_02: {r}\n"
        )
        (tmp_path / "calib_velo_to_cam.txt").write_text(
            "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n"
        )
        (tmp_path / "calib_imu_to_velo.txt").write_text(
            "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n"
        )
        calib = Calibration(str(tmp_path))

        rng = np.random.default_rng(0)
        n = 400
        scan = np.zeros((n, 4), dtype=np.float32)
        scan[:, 0] = rng.uniform(5, 40, n)      # forward
        scan[:, 1] = rng.uniform(-3, 3, n)      # left
        scan[:, 2] = rng.uniform(-1.5, 0.5, n)  # up
        velo_file = tmp_path / "scan.bin"
        scan.tofile(velo_file)

        gt = depth_gt_from_velo(str(velo_file), calib, width=128, height=64)
        assert gt.shape == (64, 128)
        assert (gt > 0).sum() > 50          # sparse but populated
        valid = gt[gt > 0]
        assert valid.min() >= 4.0 and valid.max() <= 41.0

    def test_velo_path_mapping(self):
        from unsupervised_pseuso_lidar_tpu.data.velo_gt import velo_path_for_image

        path = "/k/2011_09_26/d_sync/image_02/data/0000000005.png"
        assert velo_path_for_image(path) == (
            "/k/2011_09_26/d_sync/velodyne_points/data/0000000005.bin"
        )
