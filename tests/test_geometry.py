"""Unit tests for the geometry core (SE(3), camera, resampling, warp).

Closed-form cases plus torch-CPU as an independent numerical oracle for
grid_sample — the correctness-gating op (SURVEY.md §7 risk list).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_pseuso_lidar_tpu.geometry import se3, camera, warp
from unsupervised_pseuso_lidar_tpu.ops import resample


RNG = np.random.default_rng(0)


class TestSE3:
    def test_is_rotation_matrix_per_matrix(self):
        # batched input returns per-matrix verdicts; benign per-matrix
        # float error must not accumulate across the batch (a whole-batch
        # Frobenius norm rejected valid batches around B ~ 100)
        rots = se3.euler2mat(jnp.asarray(RNG.uniform(-1, 1, (128, 3))))
        ok = se3.is_rotation_matrix(rots)
        assert ok.shape == (128,)
        assert bool(ok.all())
        bad = rots.at[7].mul(2.0)
        verdicts = se3.is_rotation_matrix(bad)
        assert not bool(verdicts[7]) and bool(verdicts[0])
        # single [3, 3] input keeps the scalar convention
        assert se3.is_rotation_matrix(jnp.eye(3)).shape == ()

    def test_euler2mat_identity(self):
        rot = se3.euler2mat(jnp.zeros((2, 3)))
        np.testing.assert_allclose(rot, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_euler2mat_single_axis(self):
        theta = 0.3
        rot = se3.euler2mat(jnp.array([[0.0, 0.0, theta]]))[0]
        expected = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]
        )
        np.testing.assert_allclose(rot, expected, atol=1e-6)

    def test_mat2euler_roundtrip_zyx(self):
        # mat2euler decomposes the Rz@Ry@Rx (OXTS) convention.
        from unsupervised_pseuso_lidar_tpu.geometry import oxts

        angles = RNG.uniform(-1.0, 1.0, (8, 3))
        for ang in angles:
            rot = oxts.rotz(ang[2]) @ oxts.roty(ang[1]) @ oxts.rotx(ang[0])
            recovered = se3.mat2euler(jnp.asarray(rot))
            np.testing.assert_allclose(recovered, ang, atol=1e-6)

    def test_rotation_is_orthonormal(self):
        angles = jnp.asarray(RNG.uniform(-3.0, 3.0, (16, 3)), dtype=jnp.float32)
        rot = np.asarray(se3.euler2mat(angles))
        eye = np.einsum("bij,bkj->bik", rot, rot)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)

    def test_axisangle_matches_euler_single_axis(self):
        # A rotation about a single axis is the same in both parameterizations.
        theta = 0.37
        for axis in range(3):
            vec = np.zeros((1, 3), dtype=np.float32)
            vec[0, axis] = theta
            aa = se3.rot_from_axisangle(jnp.asarray(vec))[0, :3, :3]
            eu = se3.euler2mat(jnp.asarray(vec))[0]
            np.testing.assert_allclose(aa, eu, atol=1e-6)

    def test_axisangle_small_angle(self):
        vec = jnp.asarray([[1e-9, 0.0, 0.0]], dtype=jnp.float32)
        rot = se3.rot_from_axisangle(vec)[0]
        np.testing.assert_allclose(rot, np.eye(4), atol=1e-5)

    def test_transformation_from_parameters_invert_is_inverse(self):
        aa = jnp.asarray(RNG.uniform(-0.5, 0.5, (4, 3)), dtype=jnp.float32)
        t = jnp.asarray(RNG.uniform(-2, 2, (4, 3)), dtype=jnp.float32)
        fwd = np.asarray(se3.transformation_from_parameters(aa, t, invert=False))
        bwd = np.asarray(se3.transformation_from_parameters(aa, t, invert=True))
        prod = fwd @ bwd
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)

    def test_invert_pose(self):
        aa = jnp.asarray(RNG.uniform(-0.5, 0.5, (4, 3)), dtype=jnp.float32)
        t = jnp.asarray(RNG.uniform(-2, 2, (4, 3)), dtype=jnp.float32)
        pose = np.asarray(se3.transformation_from_parameters(aa, t))
        prod = pose @ np.asarray(se3.invert_pose(jnp.asarray(pose)))
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)

    def test_pose_matrix_invert_matches_reference_composition(self):
        # Reference builds T then calls invert_pose (pose_geometry.py:222);
        # pose_matrix(invert=True) must equal invert_pose(pose_matrix()).
        vec = jnp.asarray(RNG.uniform(-0.5, 0.5, (4, 6)), dtype=jnp.float32)
        direct = se3.pose_matrix(vec, invert=True)
        composed = se3.invert_pose(se3.pose_matrix(vec))
        np.testing.assert_allclose(direct, composed, atol=1e-6)

    def test_pose_vec2mat_layout(self):
        vec = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 2.0, 3.0]], dtype=jnp.float32)
        mat = se3.pose_vec2mat(vec)
        assert mat.shape == (1, 3, 4)
        np.testing.assert_allclose(mat[0, :, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(mat[0, :, 3], [1, 2, 3], atol=1e-6)


def _intrinsics(batch=2):
    k = np.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1.0]], dtype=np.float32)
    return jnp.asarray(np.broadcast_to(k, (batch, 3, 3)))


class TestCamera:
    def test_backproject_project_roundtrip_identity(self):
        batch, height, width = 2, 48, 64
        depth = jnp.asarray(
            RNG.uniform(1.0, 10.0, (batch, height, width)), dtype=jnp.float32
        )
        k = _intrinsics(batch)
        points = camera.backproject(depth, k)
        assert points.shape == (batch, height, width, 3)
        # z-coordinate of backprojected points equals depth
        np.testing.assert_allclose(points[..., 2], depth, atol=1e-4)
        eye = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))
        grid = camera.project(points, k, eye)
        # identity transform projects back onto the (normalized) pixel grid
        u = (np.asarray(grid[..., 0]) + 1) / 2 * (width - 1)
        v = (np.asarray(grid[..., 1]) + 1) / 2 * (height - 1)
        uu, vv = np.meshgrid(np.arange(width), np.arange(height))
        np.testing.assert_allclose(u[0], uu, atol=2e-2)
        np.testing.assert_allclose(v[0], vv, atol=2e-2)

    def test_backproject_pinhole_formula(self):
        # X = (u - cx) * d / fx for the pinhole model.
        batch, height, width = 1, 8, 8
        depth = jnp.full((batch, height, width), 5.0)
        k = _intrinsics(batch)
        points = camera.backproject(depth, k)
        u, v = 3, 2
        np.testing.assert_allclose(
            points[0, v, u, 0], (u - 32.0) * 5.0 / 100.0, atol=1e-4
        )
        np.testing.assert_allclose(
            points[0, v, u, 1], (v - 24.0) * 5.0 / 100.0, atol=1e-4
        )

    def test_scale_intrinsics(self):
        k = _intrinsics(1)[0]
        scaled = camera.scale_intrinsics(k, 0.5, 0.25)
        np.testing.assert_allclose(scaled[0], k[0] * 0.5, atol=1e-6)
        np.testing.assert_allclose(scaled[1], k[1] * 0.25, atol=1e-6)
        np.testing.assert_allclose(scaled[2], k[2], atol=1e-6)


class TestGridSample:
    def test_identity_grid_returns_image(self):
        batch, height, width, chans = 2, 24, 32, 3
        img = jnp.asarray(
            RNG.uniform(0, 1, (batch, height, width, chans)), dtype=jnp.float32
        )
        xs = jnp.linspace(-1, 1, width)
        ys = jnp.linspace(-1, 1, height)
        grid = jnp.stack(jnp.meshgrid(xs, ys), axis=-1)
        grid = jnp.broadcast_to(grid, (batch, height, width, 2))
        out = resample.grid_sample(img, grid)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_out_of_bounds_is_zero(self):
        img = jnp.ones((1, 8, 8, 1))
        grid = jnp.full((1, 4, 4, 2), -3.0)  # everything far out of range
        out = resample.grid_sample(img, grid)
        np.testing.assert_allclose(out, 0.0, atol=1e-7)

    def test_matches_torch_grid_sample(self):
        torch = pytest.importorskip("torch")
        batch, height, width, chans = 2, 17, 23, 3
        img = RNG.uniform(-1, 1, (batch, height, width, chans)).astype(np.float32)
        grid = RNG.uniform(-1.3, 1.3, (batch, 12, 14, 2)).astype(np.float32)

        ours = resample.grid_sample(jnp.asarray(img), jnp.asarray(grid))

        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        tgrid = torch.from_numpy(grid)
        theirs = torch.nn.functional.grid_sample(
            timg, tgrid, mode="bilinear", padding_mode="zeros", align_corners=True
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_resize_bilinear_matches_torch(self):
        torch = pytest.importorskip("torch")
        img = RNG.uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)
        for out_h, out_w in [(24, 32), (6, 8), (17, 9)]:
            ours = resample.resize_bilinear(jnp.asarray(img), out_h, out_w)
            theirs = torch.nn.functional.interpolate(
                torch.from_numpy(img).permute(0, 3, 1, 2),
                size=(out_h, out_w),
                mode="bilinear",
                align_corners=False,
            ).permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_nearest_matches_torch(self):
        torch = pytest.importorskip("torch")
        img = RNG.uniform(0, 1, (1, 10, 12, 2)).astype(np.float32)
        ours = resample.upsample2x_nearest(jnp.asarray(img))
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(img).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)
        ours2 = resample.resize_nearest(jnp.asarray(img), 20, 24)
        np.testing.assert_allclose(np.asarray(ours2), theirs, atol=1e-6)


class TestGridSampleMxu:
    """grid_sample_mxu (band-matmul warp) vs the exact gather sampler."""

    def _smooth_grid(self, batch, height, width, y_amp=0.05, x_amp=0.3):
        xs = np.linspace(-1, 1, width)
        ys = np.linspace(-1, 1, height)
        grid = np.stack(np.meshgrid(xs, ys), axis=-1)[None]
        flow = np.stack(
            [
                RNG.uniform(-x_amp, x_amp, (batch, height, width)),
                RNG.uniform(-y_amp, y_amp, (batch, height, width)),
            ],
            axis=-1,
        )
        return jnp.asarray(grid + flow, dtype=jnp.float32)

    def test_matches_gather_fp32(self):
        batch, height, width, chans = 2, 16, 24, 3
        img = jnp.asarray(
            RNG.uniform(0, 1, (batch, height, width, chans)), jnp.float32
        )
        grid = self._smooth_grid(batch, height, width)
        ref = resample.grid_sample(img, grid)
        got = resample.grid_sample_mxu(img, grid, dot_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_matches_gather_bf16_on_8bit_values(self):
        batch, height, width = 2, 16, 24
        img = jnp.asarray(
            RNG.integers(0, 256, (batch, height, width, 3)), jnp.float32
        )
        grid = self._smooth_grid(batch, height, width)
        ref = resample.grid_sample(img, grid)
        got = resample.grid_sample_mxu(img, grid)
        # bf16 interpolation weights: <=0.4% of the 0..255 value range
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1.0)

    def test_out_of_bounds_is_zero(self):
        img = jnp.ones((1, 16, 16, 1))
        grid = jnp.full((1, 16, 16, 2), -3.0)
        out = resample.grid_sample_mxu(img, grid, dot_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_non_multiple_height(self):
        batch, height, width = 1, 13, 24
        img = jnp.asarray(
            RNG.uniform(0, 1, (batch, height, width, 3)), jnp.float32
        )
        grid = self._smooth_grid(batch, height, width)
        ref = resample.grid_sample(img, grid)
        got = resample.grid_sample_mxu(img, grid, dot_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_gradients_match_gather(self):
        batch, height, width = 1, 16, 24
        img = jnp.asarray(
            RNG.uniform(0, 1, (batch, height, width, 3)), jnp.float32
        )
        # keep sample points away from integer crossings where the bilinear
        # subgradient is ambiguous between implementations
        grid = self._smooth_grid(batch, height, width, y_amp=0.03, x_amp=0.1)

        def loss(fn, g):
            return jnp.mean(jnp.abs(fn(img, g) - 0.5))

        g_ref = jax.grad(
            lambda g: loss(lambda i, gg: resample.grid_sample(i, gg), g)
        )(grid)
        g_mxu = jax.grad(
            lambda g: loss(
                lambda i, gg: resample.grid_sample_mxu(
                    i, gg, dot_dtype=jnp.float32
                ),
                g,
            )
        )(grid)
        np.testing.assert_allclose(
            np.asarray(g_mxu), np.asarray(g_ref), atol=1e-4
        )

    def test_band_coverage(self):
        height, width = 16, 24
        xs = jnp.linspace(-1, 1, width)
        ys = jnp.linspace(-1, 1, height)
        grid = jnp.broadcast_to(
            jnp.stack(jnp.meshgrid(xs, ys), axis=-1), (1, height, width, 2)
        )
        assert float(resample.band_coverage(grid, band_pad=12)) == 1.0
        # a UNIFORM shift of any size is absorbed by the adaptive center
        shifted = grid.at[..., 1].add(9.0 * 2.0 / (height - 1))
        assert float(resample.band_coverage(shifted, band_pad=2)) == 1.0
        # but within-block SPREAD must fit: rows alternate +-1.5 px
        # (block mean 0) -> inside a pad-3 band, outside a pad-2 band
        signs = jnp.where(jnp.arange(height) % 2 == 0, 1.5, -1.5)
        spread = grid.at[..., 1].add(
            signs[None, :, None] * 2.0 / (height - 1)
        )
        assert float(resample.band_coverage(spread, band_pad=3)) == 1.0
        assert float(resample.band_coverage(spread, band_pad=2)) < 1.0


class TestInverseWarp:
    def test_identity_pose_identity_warp(self):
        batch, height, width = 1, 32, 48
        img = jnp.asarray(
            RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32
        )
        depth = jnp.full((batch, height, width), 5.0)
        pose = jnp.zeros((batch, 6))
        k = _intrinsics(batch)[:1]
        warped = warp.inverse_warp(img, depth, pose, k)
        # interior must match almost exactly (borders touched by the 1e-5 eps)
        np.testing.assert_allclose(
            warped[:, 2:-2, 2:-2], img[:, 2:-2, 2:-2], atol=1e-2
        )

    def test_translation_shifts_image(self):
        # Camera translating +x with constant depth shifts sampling by
        # fx * tx / depth pixels.
        batch, height, width = 1, 32, 48
        img = jnp.asarray(
            RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32
        )
        depth_val, tx = 10.0, 0.5
        depth = jnp.full((batch, height, width), depth_val)
        pose = jnp.asarray([[0, 0, 0, tx, 0, 0]], dtype=jnp.float32)
        k = _intrinsics(1)
        warped = warp.inverse_warp(img, depth, pose, k)
        shift_px = 100.0 * tx / depth_val  # = 5 pixels
        assert float(shift_px) == 5.0
        # warped[u] samples img at u + shift
        np.testing.assert_allclose(
            warped[0, 4:-4, 4:-9], img[0, 4:-4, 9:-4], atol=1e-2
        )

    def test_invert_roundtrip(self):
        # warp with pose then warp back with inverted pose ~ identity
        # (away from disocclusion borders, with smooth image content).
        batch, height, width = 1, 64, 64
        yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        smooth = np.stack(
            [np.sin(xx / 9.0), np.cos(yy / 7.0), np.sin((xx + yy) / 11.0)], axis=-1
        ).astype(np.float32)
        img = jnp.asarray(smooth[None])
        depth = jnp.full((batch, height, width), 8.0)
        pose = jnp.asarray([[0.0, 0.0, 0.0, 0.3, 0.1, 0.0]], dtype=jnp.float32)
        k = _intrinsics(1)
        there = warp.inverse_warp(img, depth, pose, k)
        back = warp.inverse_warp(there, depth, pose, k, invert_pose=True)
        np.testing.assert_allclose(
            back[:, 12:-12, 12:-12], img[:, 12:-12, 12:-12], atol=5e-2
        )

    def test_disp_to_depth(self):
        disp = jnp.asarray([0.0, 0.5, 1.0])
        depth = warp.disp_to_depth(disp)
        np.testing.assert_allclose(depth, [1 / 0.01, 1 / 5.01, 1 / 10.01], rtol=1e-5)
        np.testing.assert_allclose(warp.depth_to_disp(depth), disp, atol=1e-6)

    def test_warp_is_differentiable(self):
        batch, height, width = 1, 16, 16
        img = jnp.asarray(RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32)
        k = _intrinsics(1)

        def loss_fn(pose, depth):
            warped = warp.inverse_warp(img, depth, pose, k)
            return jnp.mean(jnp.abs(warped - img))

        pose = jnp.asarray([[0.01, 0.0, 0.0, 0.1, 0.0, 0.0]], dtype=jnp.float32)
        depth = jnp.full((batch, height, width), 5.0)
        grads = jax.grad(loss_fn, argnums=(0, 1))(pose, depth)
        assert np.isfinite(np.asarray(grads[0])).all()
        assert np.isfinite(np.asarray(grads[1])).all()
        assert float(jnp.abs(grads[0]).sum()) > 0


class TestDecomposeProjection:
    """decompose_projection: P = K [R | t] round-trips (the reference's
    generic-sequence factor_P, notes/toy_problem/dataloaders.py:37-54)."""

    def test_round_trip(self):
        import numpy as np

        from unsupervised_pseuso_lidar_tpu.geometry import (
            decompose_projection,
        )
        from unsupervised_pseuso_lidar_tpu.geometry.se3 import euler2mat

        rng = np.random.default_rng(3)
        for scale in (1.0, -2.7, 0.013):
            k_true = np.array(
                [[720.0, 0.5, 320.0], [0.0, 700.0, 96.0], [0.0, 0.0, 1.0]]
            )
            angles = rng.uniform(-0.8, 0.8, 3).astype(np.float32)
            r_true = np.asarray(
                euler2mat(angles[None])[0], dtype=np.float64
            )
            t_true = rng.uniform(-2, 2, 3)
            proj = scale * (k_true @ np.hstack([r_true, t_true[:, None]]))
            k, r, t = decompose_projection(proj)
            # float32 euler2mat bounds the achievable tolerance;
            # K normalized so K[2,2] == 1 for comparison
            k_n = k / k[2, 2]
            np.testing.assert_allclose(k_n, k_true, atol=1e-3)
            np.testing.assert_allclose(r, r_true, atol=1e-5)
            np.testing.assert_allclose(t, t_true, atol=1e-4)
            assert np.linalg.det(r) > 0
            assert (np.diag(k) > 0).all()

    def test_chirality_flip(self):
        """`front_point` repairs cameras whose canonical decomposition
        puts the scene at negative depth (the Oxford dino turntable
        case, notes/toy_problem/dataloaders.py:37-54)."""
        import numpy as np

        from unsupervised_pseuso_lidar_tpu.geometry import (
            decompose_projection,
        )
        from unsupervised_pseuso_lidar_tpu.geometry.se3 import euler2mat

        rng = np.random.default_rng(7)
        k_true = np.array(
            [[720.0, 0.0, 320.0], [0.0, 700.0, 96.0], [0.0, 0.0, 1.0]]
        )
        angles = rng.uniform(-0.8, 0.8, 3).astype(np.float32)
        r_true = np.asarray(euler2mat(angles[None])[0], dtype=np.float64)
        t_true = np.array([0.3, -0.2, -4.0])
        # an OpenGL-convention camera: the scene sits at NEGATIVE z of
        # (R, t) — exactly what the Oxford turntable matrices encode.
        # The canonical diag(K)>0, det(R)=+1 decomposition reproduces
        # (R, t) and therefore keeps the scene behind the camera.
        proj = k_true @ np.hstack([r_true, t_true[:, None]])
        front_cam = np.array([0.1, 0.2, -0.5])  # z_cam ~ -4.5
        front = r_true.T @ (front_cam - t_true)  # same point, world frame

        k0, r0, t0 = decompose_projection(proj)
        assert (r0[2] @ front + t0[2]) < 0
        k1, r1, t1 = decompose_projection(proj, front_point=front)
        assert (r1[2] @ front + t1[2]) > 0
        assert np.linalg.det(r1) > 0
        assert k1[0, 0] > 0 and abs(k1[2, 2] - 1.0) < 1e-12
        # P = K [R | t] still holds (up to overall projective scale)
        recon = k1 @ np.hstack([r1, t1[:, None]])
        scale = recon[2, :3] @ proj[2, :3] / (proj[2, :3] @ proj[2, :3])
        np.testing.assert_allclose(recon, scale * proj, atol=1e-9)
        # and both decompositions project the front point to the SAME
        # pixel as the original matrix
        ph = np.concatenate([front, [1.0]])
        for k, r, t in ((k0, r0, t0), (k1, r1, t1)):
            x = k @ (r @ front + t)
            x_ref = proj @ ph
            np.testing.assert_allclose(
                x[:2] / x[2], x_ref[:2] / x_ref[2], atol=1e-9
            )


class TestRelativePose6dof:
    """oxts -> warp-convention 6-vec (geometry/oxts.relative_pose_6dof).

    The reference composes the INVERSE direction and zeroes rotation
    (dataloaders.py:65-69,108-116 + its open 'TODO: rotation relative');
    these tests pin the corrected semantics: the 6-vec parameterizes the
    tgt -> ref transform in the pose-net/warp convention (axis-angle)."""

    def test_pure_translation_direction(self):
        import numpy as np

        from unsupervised_pseuso_lidar_tpu.geometry.oxts import (
            relative_pose_6dof,
        )

        # camera advances +2 m along world/IMU x between tgt and ref
        # (identity imu_to_cam): the tgt origin sits at -2 x in the ref
        # frame, so the warp-convention translation is (-2, 0, 0)
        t_w_tgt = np.eye(4)
        t_w_ref = np.eye(4)
        t_w_ref[0, 3] = 2.0
        vec = relative_pose_6dof(t_w_tgt, t_w_ref, np.eye(4))
        np.testing.assert_allclose(vec[:3], 0.0, atol=1e-7)
        np.testing.assert_allclose(vec[3:], [-2.0, 0.0, 0.0], atol=1e-6)

    def test_rotation_is_axis_angle_of_relative_rotation(self):
        import numpy as np

        from unsupervised_pseuso_lidar_tpu.geometry.oxts import (
            relative_pose_6dof,
            rotz,
        )

        theta = np.radians(30.0)
        t_w_tgt = np.eye(4)
        t_w_ref = np.eye(4)
        t_w_ref[:3, :3] = rotz(theta)  # ref axes yawed +theta in world
        vec = relative_pose_6dof(t_w_tgt, t_w_ref, np.eye(4))
        # T_{ref<-tgt} = inv(T_w_ref) = Rz(-theta) -> axis-angle (0,0,-theta)
        np.testing.assert_allclose(vec[:3], [0, 0, -theta], atol=1e-6)
        np.testing.assert_allclose(vec[3:], 0.0, atol=1e-7)

    def test_matches_warp_pose_matrix(self):
        # the 6-vec, pushed through the warp's own pose_matrix, must
        # reproduce the exact relative camera transform
        import jax.numpy as jnp
        import numpy as np

        from unsupervised_pseuso_lidar_tpu.geometry.oxts import (
            relative_pose_6dof,
            rotx,
            rotz,
        )
        from unsupervised_pseuso_lidar_tpu.geometry.se3 import pose_matrix

        t_w_tgt = np.eye(4)
        t_w_tgt[:3, :3] = rotz(0.2)
        t_w_tgt[:3, 3] = [1.0, -2.0, 0.5]
        t_w_ref = np.eye(4)
        t_w_ref[:3, :3] = rotz(0.3) @ rotx(0.05)
        t_w_ref[:3, 3] = [1.5, -2.2, 0.4]
        imu_to_cam = np.eye(4)
        imu_to_cam[:3, :3] = rotx(np.pi / 2)  # a nontrivial mount

        vec = relative_pose_6dof(t_w_tgt, t_w_ref, imu_to_cam)
        rebuilt = np.asarray(pose_matrix(jnp.asarray(vec[None]))[0])
        expect = (
            imu_to_cam
            @ np.linalg.inv(t_w_ref)
            @ t_w_tgt
            @ np.linalg.inv(imu_to_cam)
        )
        np.testing.assert_allclose(rebuilt, expect, atol=1e-5)

    def test_axis_angle_log_small_and_finite_angles(self):
        import numpy as np

        from unsupervised_pseuso_lidar_tpu.geometry.oxts import (
            axis_angle_from_matrix,
            rotz,
        )

        np.testing.assert_allclose(
            axis_angle_from_matrix(np.eye(3)), 0.0, atol=1e-12
        )
        tiny = 1e-9
        np.testing.assert_allclose(
            axis_angle_from_matrix(rotz(tiny)), [0, 0, tiny], atol=1e-12
        )
        np.testing.assert_allclose(
            axis_angle_from_matrix(rotz(1.0)), [0, 0, 1.0], atol=1e-7
        )
