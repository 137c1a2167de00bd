"""Multi-host (multi-process) initialization.

The reference imports torch.distributed but never uses it (SURVEY.md §2
parallelism table); here multi-host training is jax.distributed: each host
process joins the cluster, sees its local chips, and the SAME pjit train
step spans the global DCN+ICI mesh — no user-level communication code.

Not exercisable in this single-host image; kept thin and env-driven so a
pod deployment is `initialize()` + the existing Trainer.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host JAX cluster (idempotent, env-var driven).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted; returns False (no-op) when neither is provided —
    single-host runs need no initialization.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(spatial: int = 1):
    """Mesh over ALL devices in the cluster (data axis spans hosts over DCN,
    chips within a host over ICI)."""
    from unsupervised_pseuso_lidar_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices=len(jax.devices()), spatial=spatial)
