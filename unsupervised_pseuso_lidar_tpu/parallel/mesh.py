"""Device-mesh construction and sharding rules (jax.sharding + pjit).

The reference is strictly single-device (SURVEY.md §2 parallelism
inventory: torch DataParallel appears only as a checkpoint-key shim).
Here multi-chip scaling is first-class and expressed the XLA way: build a
Mesh, annotate array shardings, and let the compiler insert the
collectives (psum of grads over the data axis rides the ICI ring; nothing
in user code names a collective).

Axes:
  * "data"    — batch-dimension data parallelism (the north-star config:
                batch 12 over a v4-8 slice).
  * "spatial" — optional image-height sharding for very large resolutions;
                XLA GSPMD partitions the convolutions with halo exchange.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ("data",) or ("data", "spatial") mesh.

    Args:
      n_devices: total devices to use (default: all available).
      spatial: size of the spatial axis; data axis gets n_devices // spatial.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % spatial != 0:
        raise ValueError(f"{n_devices} devices not divisible by spatial={spatial}")
    if spatial > 1:
        grid = devices.reshape(n_devices // spatial, spatial)
        return Mesh(grid, ("data", "spatial"))
    return Mesh(devices.reshape(n_devices), ("data",))


def _spatial_axis(mesh: Mesh) -> Optional[str]:
    return "spatial" if "spatial" in mesh.axis_names else None


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Sharding for an [B, ...] array: B over "data", H over "spatial" when
    the mesh has one. Image arrays are channels-last with H third-from-last
    — [B, H, W, C] and the stacked [B, 2, H, W, C] ref pair alike — so the
    spatial axis pins ndim-3, never the size-2 frame axis of ref_imgs."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    if _spatial_axis(mesh) and ndim >= 4:
        spec[ndim - 3] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch pytree with batch-dim sharding.

    Dict batches get key-aware treatment: "groundtruth" is [B, H, W]
    (rank 3, H at axis 1 — the generic ndim-3 rule would pin the batch
    axis), and leaving it H-replicated under a spatial mesh forces GSPMD
    to all-gather a full-res tensor in the supervised term every step."""

    def put(key, x):
        if (
            key == "groundtruth"
            and np.ndim(x) == 3
            and _spatial_axis(mesh)
        ):
            return jax.device_put(
                x, NamedSharding(mesh, P("data", "spatial", None))
            )
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    if isinstance(batch, dict):
        return {k: put(k, v) for k, v in batch.items()}
    return jax.tree.map(lambda x: put(None, x), batch)


def shard_train_state(mesh: Mesh, state: Any) -> Any:
    """Replicate train state (params/opt state) across the mesh.

    Parameters are small (~14M for DispResNet) relative to HBM, so full
    replication is the right call — no FSDP-style sharding needed; grads
    are psum-reduced by XLA over "data"."""
    return jax.device_put(state, replicated_sharding(mesh))
