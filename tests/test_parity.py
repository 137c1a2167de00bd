"""Cross-framework parity vs benchmarks/torch_baseline.py — the SPEED
harness's torch implementation, checked here so its baseline numbers
measure the same math.

The PRIMARY accuracy-parity evidence is tests/test_reference_oracle.py,
which imports the reference's own executable code from /root/reference as
the oracle; this module only keeps the independent torch baseline honest."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from torch_baseline import axisangle_to_matrix, smooth_loss as torch_smooth, warp as torch_warp  # noqa: E402

from unsupervised_pseuso_lidar_tpu.geometry.se3 import pose_matrix  # noqa: E402
from unsupervised_pseuso_lidar_tpu.geometry.warp import inverse_warp  # noqa: E402
from unsupervised_pseuso_lidar_tpu.losses.smoothness import smooth_loss  # noqa: E402

RNG = np.random.default_rng(11)


def test_inverse_warp_matches_torch_pipeline():
    b, h, w = 2, 48, 64
    img = RNG.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    depth = RNG.uniform(4, 12, (b, h, w)).astype(np.float32)
    pose = (RNG.uniform(-0.05, 0.05, (b, 6))).astype(np.float32)
    k = np.array([[90.0, 0, 32], [0, 90.0, 24], [0, 0, 1]], dtype=np.float32)

    ours = inverse_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(pose),
        jnp.asarray(np.broadcast_to(k, (b, 3, 3))),
    )

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    theirs = torch_warp(
        timg, torch.from_numpy(depth), torch.from_numpy(pose),
        torch.from_numpy(k),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_axisangle_rotation_matches_torch():
    vec = RNG.uniform(-0.4, 0.4, (4, 6)).astype(np.float32)
    ours = np.asarray(pose_matrix(jnp.asarray(vec)))[:, :3, :3]
    theirs = axisangle_to_matrix(torch.from_numpy(vec[:, :3])).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_smoothness_matches_torch():
    depth = RNG.uniform(1, 20, (2, 16, 20, 1)).astype(np.float32)
    ours = float(smooth_loss(jnp.asarray(depth)))
    theirs = float(torch_smooth(torch.from_numpy(depth).permute(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)
