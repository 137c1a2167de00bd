"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding (pjit over a Mesh) is exercised without TPU hardware — the TPU
analog of "multi-node without a cluster" (SURVEY.md §4).

Environment variables must be set before jax is imported anywhere, which is
why this lives at the top of the root conftest.
"""

import os
import sys

# Force CPU even when the host env preselects a TPU platform
# (JAX_PLATFORMS=axon is preset in this image, and the axon plugin ignores
# the env var — only jax.config.update works; see below).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Full fp32 matmuls for numerical parity checks (prod uses the fast default).
import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the CPU-backend compiles of the full train
# step take minutes; cache them across test processes/runs.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
