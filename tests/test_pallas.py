"""Pallas kernel tests (interpret mode on CPU) against the jnp reference
implementations."""

import numpy as np
import jax.numpy as jnp

from unsupervised_pseuso_lidar_tpu.ops.pallas.photometric import (
    photometric_map_pallas,
    ssim_distance_pallas,
)
from unsupervised_pseuso_lidar_tpu.ops.ssim import ssim_distance

RNG = np.random.default_rng(7)


def test_ssim_pallas_matches_jnp():
    x = jnp.asarray(RNG.uniform(0, 1, (2, 16, 24, 3)), dtype=jnp.float32)
    y = jnp.asarray(RNG.uniform(0, 1, (2, 16, 24, 3)), dtype=jnp.float32)
    ours = ssim_distance_pallas(x, y, interpret=True)
    ref = ssim_distance(x, y)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_photometric_blend_pallas():
    x = jnp.asarray(RNG.uniform(0, 1, (1, 12, 16, 3)), dtype=jnp.float32)
    y = jnp.asarray(RNG.uniform(0, 1, (1, 12, 16, 3)), dtype=jnp.float32)
    ours = photometric_map_pallas(x, y, interpret=True)
    ref = 0.85 * ssim_distance(x, y) + 0.15 * jnp.abs(y - x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_identical_images_zero():
    x = jnp.asarray(RNG.uniform(0, 1, (1, 8, 8, 2)), dtype=jnp.float32)
    out = ssim_distance_pallas(x, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
