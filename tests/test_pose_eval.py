"""Pose-evaluation metrics (eval/pose.py): snippet ATE + rotation error.

The reference has no numeric pose evaluation (its pose-vs-OXTS check is a
hand-pasted dump, /root/reference/notes/what_the_hell.txt); these tests
pin the closed-form behavior of the metric this framework adds."""

import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_pseuso_lidar_tpu.eval.pose import (
    make_pose_eval_step,
    pose_errors,
)


def _vec(rot, trans):
    return np.concatenate([np.asarray(rot), np.asarray(trans)], axis=-1)


class TestPoseErrors:
    def test_exact_match_pure_translation(self):
        # zero rotation: the axis-angle and euler conventions agree exactly
        gt = np.zeros((3, 2, 6), np.float32)
        gt[..., 3:] = np.random.default_rng(0).normal(size=(3, 2, 3))
        m = pose_errors(jnp.asarray(gt), jnp.asarray(gt))
        assert float(m["ate"]) == pytest.approx(0.0, abs=1e-6)
        assert float(m["ate_unscaled"]) == pytest.approx(0.0, abs=1e-6)
        assert float(m["rot_err_deg"]) == pytest.approx(0.0, abs=1e-3)
        assert float(m["scale"]) == pytest.approx(1.0, abs=1e-6)

    def test_scale_alignment_absorbs_global_scale(self):
        # self-supervised pose has a global scale ambiguity: a prediction
        # at half the true scale must still score ATE ~ 0 (scale ~ 2)
        rng = np.random.default_rng(1)
        t_gt = rng.normal(size=(4, 2, 3)).astype(np.float32)
        gt = _vec(np.zeros((4, 2, 3), np.float32), t_gt)
        pred = _vec(np.zeros((4, 2, 3), np.float32), 0.5 * t_gt)
        m = pose_errors(jnp.asarray(pred), jnp.asarray(gt))
        assert float(m["ate"]) == pytest.approx(0.0, abs=1e-5)
        assert float(m["ate_unscaled"]) > 0.1
        assert float(m["scale"]) == pytest.approx(2.0, rel=1e-4)

    def test_translation_error_magnitude(self):
        # one transform off by [d, 0, 0] with no scale freedom used:
        # disable alignment by orthogonal error (scale fit stays 1)
        gt = np.zeros((1, 2, 6), np.float32)
        gt[0, 0, 3:] = [1.0, 0.0, 0.0]
        gt[0, 1, 3:] = [0.0, 1.0, 0.0]
        pred = gt.copy()
        pred[0, 0, 5] = 0.3  # z-offset, orthogonal to both gt translations
        m = pose_errors(jnp.asarray(pred), jnp.asarray(gt))
        # rmse over the 2 snippet transforms: sqrt(mean([0.3^2, 0]))
        expect = np.sqrt((0.3**2 + 0.0) / 2.0)
        assert float(m["ate_unscaled"]) == pytest.approx(expect, rel=1e-4)

    def test_rotation_error_cross_convention(self):
        # single-axis rotations: axis-angle [a,0,0] and euler [a,0,0] are
        # both Rx(a), so cross-convention comparison must be exact
        theta = np.radians(7.0)
        pred = _vec(
            np.array([[[theta, 0, 0], [0, 0, 0]]], np.float32),
            np.zeros((1, 2, 3), np.float32),
        )
        gt_same = pred.copy()
        m = pose_errors(
            jnp.asarray(pred), jnp.asarray(gt_same),
            pred_mode="axis_angle", gt_mode="euler",
        )
        assert float(m["rot_err_deg"]) == pytest.approx(0.0, abs=1e-3)

        gt_zero = _vec(np.zeros((1, 2, 3), np.float32),
                       np.zeros((1, 2, 3), np.float32))
        m = pose_errors(jnp.asarray(pred), jnp.asarray(gt_zero))
        # mean over the 2 transforms: (7 deg + 0 deg) / 2
        assert float(m["rot_err_deg"]) == pytest.approx(3.5, rel=1e-3)

    def test_axis_angle_snippet_layout_not_squeezed(self):
        # [B, N, 6] must convert per-transform (a regression guard for
        # rot_from_axisangle's ndim==3 [B, 1, 3] special case): two
        # DIFFERENT rotations in one snippet must both be honored
        theta = np.radians(10.0)
        pred = _vec(
            np.array([[[theta, 0, 0], [theta, 0, 0]]], np.float32),
            np.zeros((1, 2, 3), np.float32),
        )
        gt = _vec(
            np.array([[[theta, 0, 0], [0, 0, 0]]], np.float32),
            np.zeros((1, 2, 3), np.float32),
        )
        m = pose_errors(jnp.asarray(pred), jnp.asarray(gt),
                        pred_mode="axis_angle", gt_mode="axis_angle")
        # first transform matches, second is 10 deg off -> mean 5 deg
        # (abs tolerance: arccos near 1 is ill-conditioned in fp32, the
        # exact-match transform contributes up to ~0.03 deg of noise)
        assert float(m["rot_err_deg"]) == pytest.approx(5.0, abs=0.05)


class TestPoseEvalStep:
    def test_step_on_synthetic_batch(self):
        import jax

        from unsupervised_pseuso_lidar_tpu.data.synthetic import (
            synthetic_triplet_batch,
        )
        from unsupervised_pseuso_lidar_tpu.train.config import Config
        from unsupervised_pseuso_lidar_tpu.train.trainer import (
            create_train_state,
        )

        config = Config.from_dict({
            "model": {
                "name": "pose_eval",
                "depth": {"name": "StnDispNet"},
                "pose": {"name": "PoseNet"},
            },
            "datasets": {
                "augmentation": {"image_width": 64, "image_height": 32},
                "sequence_length": 3,
            },
            "action": {"batch_size": 2},
        })
        state, _, pose_model, _ = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        raw = synthetic_triplet_batch(2, 32, 64, seed=0)
        batch = {k: jnp.asarray(v) for k, v in raw.items()
                 if k != "groundtruth"}

        step = make_pose_eval_step(pose_model)
        m = step(state, batch)
        for key in ("ate", "ate_unscaled", "rot_err_deg", "scale"):
            assert np.isfinite(float(m[key])), key
        assert float(m["ate"]) >= 0.0
        # an untrained net is far from the GT odometry
        assert float(m["ate_unscaled"]) > 0.0

        # semi-supervised mode: the "prediction" IS the OXTS pose
        step_ss = make_pose_eval_step(pose_model, semi_sup_pose=True)
        m = step_ss(state, batch)
        assert float(m["ate"]) == pytest.approx(0.0, abs=1e-5)
        assert float(m["rot_err_deg"]) == pytest.approx(0.0, abs=1e-3)


class TestTrajectory:
    def test_pure_forward_motion(self):
        from unsupervised_pseuso_lidar_tpu.eval.trajectory import (
            integrate_relative_poses,
        )

        # camera advances +1 m along z per frame: a static point's coords
        # in the next frame shift by -z, so the relative 6-vec is
        # [0,0,0, 0,0,-1]; world positions must come out at z = 0,1,2,3
        rel = np.tile(np.array([0, 0, 0, 0, 0, -1.0], np.float32), (3, 1))
        poses = integrate_relative_poses(rel)
        np.testing.assert_allclose(
            poses[:, :3, 3],
            [[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3]],
            atol=1e-6,
        )
        # rotations stay identity
        np.testing.assert_allclose(
            poses[:, :3, :3], np.tile(np.eye(3), (4, 1, 1)), atol=1e-6
        )

    def test_composition_maps_points_to_frame0(self):
        from unsupervised_pseuso_lidar_tpu.eval.trajectory import (
            integrate_relative_poses,
            relative_matrices,
        )

        rng = np.random.default_rng(7)
        rel = rng.normal(scale=0.3, size=(5, 6)).astype(np.float32)
        poses = integrate_relative_poses(rel, mode="axis_angle")
        mats = relative_matrices(rel, mode="axis_angle")
        # a point seen in the LAST camera frame, walked back through the
        # inverse chain, must equal P_N applied directly
        x = np.append(rng.normal(size=3), 1.0)
        walked = x.copy()
        for t in mats[::-1]:
            walked = np.linalg.solve(t, walked)
        np.testing.assert_allclose(poses[-1] @ x, walked, atol=1e-4)

    def test_float64_twins_match_se3(self):
        # the host float64 link builders must agree with the jitted se3
        # helpers (same conventions) to fp32 accuracy
        import jax.numpy as jnp

        from unsupervised_pseuso_lidar_tpu.eval.trajectory import (
            relative_matrices,
        )
        from unsupervised_pseuso_lidar_tpu.geometry.se3 import (
            euler2mat,
            pose_matrix,
        )

        rng = np.random.default_rng(11)
        rel = rng.normal(scale=0.4, size=(6, 6))
        rel[0, :3] = 0.0  # exercise the small-angle series branch
        got = relative_matrices(rel, "axis_angle")
        want = np.asarray(pose_matrix(jnp.asarray(rel, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=1e-5)
        got_e = relative_matrices(rel, "euler")
        want_rot = np.asarray(euler2mat(jnp.asarray(rel[:, :3], jnp.float32)))
        np.testing.assert_allclose(got_e[:, :3, :3], want_rot, atol=1e-6)
        # and they must be genuinely float64: a long chain of tiny
        # rotations composed in float64 stays orthonormal to ~1e-12
        tiny = np.zeros((2000, 6))
        tiny[:, 1] = 1e-3
        mats = relative_matrices(tiny, "axis_angle")
        chain = np.eye(4)
        for m in mats:
            chain = chain @ m
        err = np.abs(chain[:3, :3] @ chain[:3, :3].T - np.eye(3)).max()
        assert err < 1e-10

    def test_kitti_odometry_lines_format(self):
        from unsupervised_pseuso_lidar_tpu.eval.trajectory import (
            integrate_relative_poses,
            kitti_odometry_lines,
        )

        rel = np.zeros((2, 6), np.float32)
        lines = kitti_odometry_lines(integrate_relative_poses(rel))
        assert len(lines) == 3
        first = np.asarray(lines[0].split(), dtype=float)
        assert first.shape == (12,)
        np.testing.assert_allclose(
            first.reshape(3, 4), np.eye(4)[:3], atol=1e-9
        )
