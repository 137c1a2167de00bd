"""Host-async prefetching: overlap data loading with device compute.

The reference's input pipeline does PIL decode + OXTS parsing inside
DataLoader worker processes per __getitem__
(/root/reference/dataloaders.py:74-120, trainer.py:187-190); a TPU step is
far faster than a GPU step, so host loading must be pipelined or the chip
starves (SURVEY.md §7 risk list). This module wraps any host batch
iterator with a background-thread queue of device-ready batches.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def chunked_device_put(
    batch: Any, chunk_bytes: int = 4 << 20, streams: int = 1
) -> Any:
    """device_put with large leaves split into ~chunk_bytes batch-axis
    chunks (re-joined by a device-side concatenate).

    Measured on the tunneled v5e: host->device transfer rate DEGRADES with
    transfer size (4.4 MB moves at ~36 MB/s, 13.3 MB at ~15 MB/s); chunking
    the image leaves cut the streaming step 623 -> 455 ms. On local-PCIe
    hosts this is a wash — keep plain jax.device_put there.

    streams > 1 issues the chunk transfers from a thread pool —
    per-transfer overhead (serialization, round trips) pipelines across
    concurrent puts, raising aggregate bandwidth on high-latency links.
    """

    def put_parts(parts):
        if streams > 1 and len(parts) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=streams) as pool:
                return list(pool.map(jax.device_put, parts))
        return [jax.device_put(p) for p in parts]

    def put(leaf):
        leaf = np.asarray(leaf)
        if leaf.nbytes <= chunk_bytes or leaf.shape[0] < 2:
            return jax.device_put(leaf)
        chunks = min(leaf.shape[0], -(-leaf.nbytes // chunk_bytes))
        parts = np.array_split(leaf, chunks, axis=0)
        return jnp.concatenate(put_parts(parts), axis=0)

    return jax.tree.map(put, batch)


def prefetch_to_device(
    batch_iter: Iterator[Any],
    size: int = 2,
    device_put: Optional[Callable[[Any], Any]] = None,
    chunk_bytes: Optional[int] = None,
    streams: int = 1,
) -> Iterator[Any]:
    """Yield batches from `batch_iter`, staged onto device `size` batches
    ahead by a daemon thread.

    Args:
      batch_iter: iterator of host (numpy) batch pytrees.
      size: queue depth (2 is enough to hide loading behind compute).
      device_put: optional transfer fn (e.g. partial(shard_batch, mesh));
        defaults to jax.device_put.
      chunk_bytes: if set (and device_put is not), use chunked_device_put
        with this chunk size — faster on links whose rate degrades with
        transfer size (the dev tunnel).
      streams: concurrent chunk transfers (chunked_device_put) — pipelines
        per-transfer overhead on high-latency links.
    """
    if device_put is None:
        if chunk_bytes:
            device_put = lambda b: chunked_device_put(b, chunk_bytes, streams)
        else:
            device_put = jax.device_put

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    error: list = []

    def producer():
        try:
            for batch in batch_iter:
                q.put(device_put(batch))
        except BaseException as exc:  # propagate loader errors to consumer
            error.append(exc)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
