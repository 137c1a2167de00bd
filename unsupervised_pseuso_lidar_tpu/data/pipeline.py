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


def prefetch_to_device(
    batch_iter: Iterator[Any],
    size: int = 2,
    device_put: Optional[Callable[[Any], Any]] = None,
) -> Iterator[Any]:
    """Yield batches from `batch_iter`, staged onto device `size` batches
    ahead by a daemon thread.

    Args:
      batch_iter: iterator of host (numpy) batch pytrees.
      size: queue depth (2 is enough to hide loading behind compute).
      device_put: optional transfer fn (e.g. partial(shard_batch, mesh));
        defaults to jax.device_put.
    """
    if device_put is None:
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
