"""SE(3) algebra: rotations, pose parameterizations, rigid transforms.

Pure-JAX, batched, dtype-preserving, fully jittable (no data-dependent
control flow). Capability parity with the reference pose utilities
(/root/reference/geometry/pose_geometry.py:19-199) re-designed for XLA:
every function is a closed-form tensor expression so the compiler can fuse
it into the surrounding warp/loss computation.

Conventions:
  * Batched rotations are [B, 3, 3]; batched rigid transforms are [B, 4, 4].
  * 6-DoF pose vectors are [B, 6] = (rx, ry, rz, tx, ty, tz) — rotation
    first, translation last, matching the reference network output layout
    (/root/reference/geometry/pose_geometry.py:219).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny (3x3 / 4x4) but correctness-critical: force full
# fp32 MXU passes instead of the default bf16 path.
def _mm(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def is_rotation_matrix(rot, tol: float = 1e-6) -> jax.Array:
    """||R.T R - I||_F < tol PER MATRIX — validity check for rotations.

    Returns a scalar bool for [3, 3] input, [B] bools for [B, 3, 3]
    (a whole-batch norm would accumulate sqrt(B)·eps of benign float
    error and start rejecting valid batches around B ~ 100).

    Parity: /root/reference/geometry/pose_geometry.py:9-14."""
    rot = jnp.asarray(rot)
    eye = jnp.eye(3, dtype=rot.dtype)
    err = jnp.linalg.norm(
        _mm(jnp.swapaxes(rot, -1, -2), rot) - eye, axis=(-2, -1)
    )
    return err < tol


def euler2mat(angles: jax.Array) -> jax.Array:
    """Euler angles -> rotation matrices, R = Rx @ Ry @ Rz.

    Args:
      angles: [B, 3] (x, y, z) angles in radians.
    Returns:
      [B, 3, 3] rotation matrices.

    Parity: /root/reference/geometry/pose_geometry.py:38-68 (same
    composition order xmat·ymat·zmat).
    """
    x, y, z = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)

    zmat = jnp.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], axis=-1
    ).reshape(*x.shape, 3, 3)
    ymat = jnp.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], axis=-1
    ).reshape(*x.shape, 3, 3)
    xmat = jnp.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], axis=-1
    ).reshape(*x.shape, 3, 3)
    return _mm(_mm(xmat, ymat), zmat)


def mat2euler(rot: jax.Array) -> jax.Array:
    """Rotation matrix -> Euler angles (x, y, z) for R = Rz @ Ry @ Rx.

    NOTE: this decomposes the Rz·Ry·Rx (OXTS world-pose) convention — it is
    NOT the inverse of euler2mat (Rx·Ry·Rz); the reference pairs them the
    same way (mat2euler consumes OXTS poses built as Rz·Ry·Rx at
    /root/reference/geometry/oxts_parser.py:96-99, while euler2mat consumes
    network output). Branch-free (jnp.where) so it is jittable and batched,
    unlike the host-side scalar version in the reference
    (/root/reference/geometry/pose_geometry.py:19-36).

    Args:
      rot: [..., 3, 3] rotation matrices.
    Returns:
      [..., 3] Euler angles.
    """
    sy = jnp.sqrt(rot[..., 0, 0] ** 2 + rot[..., 1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(
        singular,
        jnp.arctan2(-rot[..., 1, 2], rot[..., 1, 1]),
        jnp.arctan2(rot[..., 2, 1], rot[..., 2, 2]),
    )
    y = jnp.arctan2(-rot[..., 2, 0], sy)
    z = jnp.where(singular, 0.0, jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


def rot_from_axisangle(vec: jax.Array) -> jax.Array:
    """Axis-angle (Rodrigues) rotation -> [B, 4, 4] homogeneous transform.

    Args:
      vec: [B, 3] (or [B, 1, 3]) axis-angle vectors; the norm is the angle.
    Returns:
      [B, 4, 4] rotation-only homogeneous matrices.

    Parity: /root/reference/geometry/pose_geometry.py:160-199 (same 1e-7
    angle regularizer).
    """
    if vec.ndim == 3:
        vec = vec[:, 0, :]
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # [B,1]
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    c = 1.0 - ca
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]

    r00 = ax * ax * c + ca
    r01 = ax * ay * c - az * sa
    r02 = az * ax * c + ay * sa
    r10 = ax * ay * c + az * sa
    r11 = ay * ay * c + ca
    r12 = ay * az * c - ax * sa
    r20 = az * ax * c - ay * sa
    r21 = ay * az * c + ax * sa
    r22 = az * az * c + ca
    zero = jnp.zeros_like(r00)
    one = jnp.ones_like(r00)
    rows = jnp.stack(
        [
            r00, r01, r02, zero,
            r10, r11, r12, zero,
            r20, r21, r22, zero,
            zero, zero, zero, one,
        ],
        axis=-1,
    )
    return rows.reshape(*r00.shape, 4, 4)


def _translation_matrix(t: jax.Array) -> jax.Array:
    """Translation vector [B, 3] -> [B, 4, 4] homogeneous transform.

    Parity: /root/reference/geometry/pose_geometry.py:144-157."""
    batch_shape = t.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (*batch_shape, 4, 4))
    return eye.at[..., :3, 3].set(t)


def transformation_from_parameters(
    axisangle: jax.Array, translation: jax.Array, invert: bool = False
) -> jax.Array:
    """(axis-angle, translation) -> [B, 4, 4] rigid transform.

    M = T(t) @ R when not inverted; M = R.T @ T(-t) when inverted — the
    monodepth2-style parameterization the reference warp uses
    (/root/reference/geometry/pose_geometry.py:124-141).

    Args:
      axisangle: [B, 3] or [B, 1, 3].
      translation: [B, 3] or [B, 1, 3].
      invert: statically known python bool (the caller's direction flag).
    """
    if translation.ndim == 3:
        translation = translation[:, 0, :]
    rot = rot_from_axisangle(axisangle)
    if invert:
        rot = jnp.swapaxes(rot, -1, -2)
        translation = -translation
    trans = _translation_matrix(translation)
    return _mm(rot, trans) if invert else _mm(trans, rot)


def pose_vec2mat(vec: jax.Array, mode: str = "euler") -> jax.Array:
    """6-DoF pose vector -> [B, 3, 4] transform (rotation from Euler angles).

    vec layout: [rx, ry, rz, tx, ty, tz].
    Parity: /root/reference/geometry/pose_geometry.py:97-108.
    """
    if mode is None:
        return vec
    if mode != "euler":
        raise ValueError(f"Rotation mode not supported: {mode}")
    rot = euler2mat(vec[..., :3])
    trans = vec[..., 3:, None]
    return jnp.concatenate([rot, trans], axis=-1)


def pose_matrix(vec: jax.Array, invert: bool = False) -> jax.Array:
    """6-DoF pose vector -> [B, 4, 4] via the axis-angle path used by the
    training warp: rot = vec[:, :3] (axis-angle), trans = vec[:, 3:].

    Parity: /root/reference/geometry/pose_geometry.py:219-223 (the pose
    assembly inside inverse_warp, including the optional inversion which
    there is a separate invert_pose() call — algebraically identical to
    transformation_from_parameters(invert=True)).
    """
    axisangle = vec[..., :3]
    translation = vec[..., 3:]
    pose = transformation_from_parameters(axisangle, translation, invert=False)
    if invert:
        pose = invert_pose(pose)
    return pose


def invert_pose(transform: jax.Array) -> jax.Array:
    """Invert [..., 4, 4] rigid transforms: [R|t]^-1 = [R.T | -R.T t].

    Parity: /root/reference/geometry/pose_geometry.py:110-122."""
    rot_t = jnp.swapaxes(transform[..., :3, :3], -1, -2)
    t_inv = -_mm(rot_t, transform[..., :3, 3:])
    top = jnp.concatenate([rot_t, t_inv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=transform.dtype),
        (*transform.shape[:-2], 1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)
