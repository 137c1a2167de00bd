"""Loss-stack tests: golden values on tiny fixed tensors, structural
invariants, numpy oracle for SSIM, and gradient-flow checks (SURVEY.md §4
"create the test strategy the reference lacks").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_pseuso_lidar_tpu.losses import (
    Losses,
    l1_loss,
    min_reprojection_loss,
    photometric_loss,
    reprojection_loss,
    smooth_loss,
    total_loss,
)
from unsupervised_pseuso_lidar_tpu.ops.ssim import ssim_distance

RNG = np.random.default_rng(2)


def _intrinsics(batch=1):
    k = np.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1.0]], dtype=np.float32)
    return jnp.asarray(np.broadcast_to(k, (batch, 3, 3)))


def _smooth_image(height, width):
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    return np.stack(
        [np.sin(xx / 9.0), np.cos(yy / 7.0), np.sin((xx + yy) / 11.0)], axis=-1
    ).astype(np.float32)


class TestSSIM:
    def test_identical_images_zero(self):
        img = jnp.asarray(RNG.uniform(0, 1, (1, 16, 16, 3)), dtype=jnp.float32)
        np.testing.assert_allclose(ssim_distance(img, img), 0.0, atol=1e-5)

    def test_matches_numpy_oracle(self):
        # Independent oracle: explicit 3x3 box filter on reflect-padded maps.
        x = RNG.uniform(0, 1, (1, 10, 12, 2)).astype(np.float32)
        y = RNG.uniform(0, 1, (1, 10, 12, 2)).astype(np.float32)

        def box(a):
            p = np.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            out = np.zeros_like(a)
            for i in range(a.shape[1]):
                for j in range(a.shape[2]):
                    out[:, i, j] = p[:, i : i + 3, j : j + 3].mean(axis=(1, 2))
            return out

        c1, c2 = 1e-4, 9e-4
        mx, my = box(x), box(y)
        sx = box(x * x) - mx * mx
        sy = box(y * y) - my * my
        sxy = box(x * y) - mx * my
        ssim = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
            (mx * mx + my * my + c1) * (sx + sy + c2)
        )
        expected = np.clip((1 - ssim) / 2, 0, 1)
        ours = ssim_distance(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


class TestPhotometric:
    def test_l1_golden(self):
        a = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        b = jnp.asarray([[2.0, 2.0], [1.0, 4.0]])
        np.testing.assert_allclose(l1_loss(a, b), (1 + 0 + 2 + 0) / 4, atol=1e-7)

    def test_clip_caps_outliers(self):
        pred = jnp.zeros((1, 8, 8, 3))
        target = jnp.zeros((1, 8, 8, 3)).at[0, 0, 0, 0].set(100.0)
        clipped = photometric_loss(pred, target, no_ssim=True, clip_loss=0.5)
        raw = photometric_loss(pred, target, no_ssim=True, clip_loss=0.0)
        assert float(clipped.max()) < float(raw.max())

    def test_clip_threshold_is_detached(self):
        # The clamp threshold mean + k*std is stop-gradient'd like the
        # reference's float() cast (losses.py:83-84): pixels above the
        # threshold must contribute ZERO gradient, not d(mean+k*std)/dx.
        import jax

        target = jnp.zeros((1, 4, 4, 1)).at[0, 0, 0, 0].set(100.0)

        def scalar(pred):
            return jnp.sum(
                photometric_loss(pred, target, no_ssim=True, clip_loss=0.5)
            )

        g = jax.grad(scalar)(jnp.zeros((1, 4, 4, 1)))
        # the outlier pixel is clamped -> its gradient must be exactly 0
        assert float(g[0, 0, 0, 0]) == 0.0
        # unclamped pixels keep the plain d|t - p|/dp = -1 gradient
        np.testing.assert_allclose(np.asarray(g[0, 1:, :, 0]), -1.0)

    def test_ssim_blend_weighting(self):
        x = jnp.asarray(RNG.uniform(0, 1, (1, 12, 12, 3)), dtype=jnp.float32)
        y = jnp.asarray(RNG.uniform(0, 1, (1, 12, 12, 3)), dtype=jnp.float32)
        blend = photometric_loss(x, y, no_ssim=False, clip_loss=0.0)
        manual = 0.85 * ssim_distance(x, y) + 0.15 * jnp.abs(y - x)
        np.testing.assert_allclose(np.asarray(blend), np.asarray(manual), atol=1e-6)


class TestSmoothness:
    def test_linear_ramp_is_zero(self):
        # Second-order penalty vanishes on planar depth.
        ramp = jnp.asarray(
            (np.arange(16)[None, :, None, None] * 0.5
             + np.arange(12)[None, None, :, None] * 0.25)
            * np.ones((2, 1, 1, 1)),
            dtype=jnp.float32,
        )
        np.testing.assert_allclose(smooth_loss(ramp), 0.0, atol=1e-5)

    def test_scale_weights_decay(self):
        # Identical curvature at two scales: second scale weighted 1/2.3.
        quad = np.arange(10, dtype=np.float32) ** 2
        m = jnp.asarray(np.broadcast_to(quad[None, :, None, None], (1, 10, 10, 1)))
        single = smooth_loss([m])
        double = smooth_loss([m, m])
        np.testing.assert_allclose(
            float(double), float(single) * (1 + 1 / 2.3), rtol=1e-5
        )

    def test_golden_value(self):
        # 1D quadratic along H: dy2 = 2 everywhere; dx*, mixed terms 0.
        quad = np.arange(8, dtype=np.float32) ** 2
        m = jnp.asarray(np.broadcast_to(quad[None, :, None, None], (1, 8, 8, 1)))
        # dy2 has 6 rows of value 2 -> mean(|dy2|) = 2; all other terms 0.
        np.testing.assert_allclose(float(smooth_loss(m)), 2.0, atol=1e-5)


class TestReprojection:
    def _triplet(self, batch=1, height=48, width=64):
        img = _smooth_image(height, width)
        tgt = jnp.asarray(np.broadcast_to(img, (batch, height, width, 3)))
        refs = [tgt, tgt]
        depth = jnp.full((batch, height, width, 1), 5.0)
        depths = [[depth], [depth]]
        poses = jnp.zeros((batch, 2, 6))
        return tgt, refs, depths, poses

    def test_static_scene_zero_pose_near_zero(self):
        tgt, refs, depths, poses = self._triplet()
        loss = reprojection_loss(tgt, refs, depths, poses, _intrinsics())
        assert float(loss) < 5e-3

    def test_unbatched_intrinsics_with_batch_gt_one(self):
        # the documented [3, 3] shared-camera shape must broadcast to the
        # whole batch (it used to tile per job only and crash at B > 1)
        tgt, refs, depths, poses = self._triplet(batch=2)
        k = _intrinsics()
        k33 = k[0] if k.ndim == 3 else k
        assert k33.shape == (3, 3)
        loss = reprojection_loss(tgt, refs, depths, poses, k33)
        assert float(loss) < 5e-3
        loss_min = min_reprojection_loss(
            tgt, refs, [depths[0][0]], poses, k33
        )
        assert np.isfinite(float(loss_min))

    def test_aligned_warp_beats_misaligned(self):
        batch, height, width = 1, 48, 64
        img = _smooth_image(height, width)
        depth_val, tx = 10.0, 0.5
        shift = int(100.0 * tx / depth_val)  # 5 px
        # ref shows the scene shifted: ref[u] = img[u + shift]; the forward
        # warp samples ref at u + fx*tx/z, so tx = -0.5 realigns it.
        ref = np.roll(img, -shift, axis=1)
        tgt = jnp.asarray(img[None])
        refs = [jnp.asarray(ref[None]), jnp.asarray(ref[None])]
        depth_map = jnp.full((batch, height, width, 1), depth_val)
        depths = [[depth_map], [depth_map]]
        good_pose = jnp.asarray(
            [[[0, 0, 0, -tx, 0, 0], [0, 0, 0, -tx, 0, 0]]], dtype=jnp.float32
        )
        bad_pose = jnp.zeros((1, 2, 6))
        good = reprojection_loss(tgt, refs, depths, good_pose, _intrinsics())
        bad = reprojection_loss(tgt, refs, depths, bad_pose, _intrinsics())
        assert float(good) < float(bad)

    def test_multi_scale_accepts_pyramid(self):
        batch, height, width = 2, 32, 48
        tgt = jnp.asarray(RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32)
        refs = [
            jnp.asarray(RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32)
            for _ in range(2)
        ]
        pyramid = [
            jnp.full((batch, height // (2 ** s), width // (2 ** s), 1), 0.3)
            for s in range(4)
        ]
        depths = [pyramid, pyramid]
        poses = jnp.asarray(RNG.uniform(-0.05, 0.05, (batch, 2, 6)), dtype=jnp.float32)
        loss = reprojection_loss(tgt, refs, depths, poses, _intrinsics(batch))
        assert np.isfinite(float(loss))

    def test_modes(self):
        tgt, refs, depths, poses = self._triplet()
        for mode in ("mean", "l1", "mse", "ssim"):
            loss = reprojection_loss(
                tgt, refs, depths, poses, _intrinsics(), mode=mode
            )
            assert np.isfinite(float(loss)), mode
        with pytest.raises(ValueError):
            reprojection_loss(tgt, refs, depths, poses, _intrinsics(), mode="nope")

    def test_min_reprojection(self):
        tgt, refs, depths, poses = self._triplet()
        loss = min_reprojection_loss(
            tgt, refs, depths[0], poses, _intrinsics(), automask=False
        )
        assert float(loss) < 5e-3

    def test_total_loss_and_gradients(self):
        batch, height, width = 1, 32, 48
        tgt = jnp.asarray(RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32)
        refs = [
            jnp.asarray(RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32)
            for _ in range(2)
        ]
        k = _intrinsics(batch)

        def loss_fn(disp, poses):
            reproj, smooth = total_loss(tgt, refs, [[disp], [disp]], poses, k)
            return reproj + smooth

        disp = jnp.full((batch, height, width, 1), 0.3)
        poses = jnp.asarray(RNG.uniform(-0.05, 0.05, (batch, 2, 6)), dtype=jnp.float32)
        # jit: eager grad of the full loss re-dispatches hundreds of ops
        # every run; the jitted program lands in the persistent compile
        # cache (tests/.jax_cache), so warm suite runs skip it entirely
        val, grads = jax.jit(
            jax.value_and_grad(loss_fn, argnums=(0, 1))
        )(disp, poses)
        assert np.isfinite(float(val))
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).sum()) > 0

    def test_losses_wrapper(self):
        tgt, refs, depths, poses = self._triplet()
        disp = (1.0 / depths[0][0] - 0.01) / 10.0
        criterion = Losses()
        reproj, smooth = criterion(tgt, refs, [[disp], [disp]], poses, _intrinsics())
        assert np.isfinite(float(reproj)) and np.isfinite(float(smooth))


class TestCoverageForFree:
    """Coverage metrics must reuse the loss's own warp coords — no second
    backproject/project chain per warp job (VERDICT r1 weak #4)."""

    def _args(self):
        batch, height, width = 1, 16, 24
        tgt = jnp.asarray(
            RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32
        )
        refs = [
            jnp.asarray(
                RNG.uniform(0, 1, (batch, height, width, 3)), dtype=jnp.float32
            )
            for _ in range(2)
        ]
        disp = jnp.full((batch, height, width, 1), 0.3)
        poses = jnp.asarray(
            RNG.uniform(-0.05, 0.05, (batch, 2, 6)), dtype=jnp.float32
        )
        return tgt, refs, [[disp], [disp]], poses, _intrinsics(batch)

    def _count_dots(self, fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)
        text = str(jaxpr)
        return text.count("dot_general")

    def test_no_extra_projection_matmuls(self):
        tgt, refs, disps, poses, k = self._args()

        def without(t, r0, r1, d, p, kk):
            re, sm = total_loss(t, [r0, r1], d, p, kk, warp_impl="mxu")
            return re + sm

        def with_cov(t, r0, r1, d, p, kk):
            re, sm, cov = total_loss(
                t, [r0, r1], d, p, kk, warp_impl="mxu", with_coverage=True
            )
            return re + sm + cov["band_coverage"]

        n0 = self._count_dots(without, tgt, refs[0], refs[1], disps, poses, k)
        n1 = self._count_dots(with_cov, tgt, refs[0], refs[1], disps, poses, k)
        # the backproject/project chains are einsums (dot_general); coverage
        # math is elementwise + reductions, so the counts must be EQUAL
        assert n0 == n1, (n0, n1)

    def test_coverage_values_sane(self):
        tgt, refs, disps, poses, k = self._args()
        re, sm, cov = total_loss(
            tgt, refs, disps, poses, k, warp_impl="mxu", with_coverage=True
        )
        assert set(cov) == {"band_coverage"}
        assert 0.0 <= float(cov["band_coverage"]) <= 1.0
        re2, sm2 = total_loss(tgt, refs, disps, poses, k, warp_impl="mxu")
        np.testing.assert_allclose(float(re), float(re2), rtol=1e-6)
