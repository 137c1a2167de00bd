"""Streaming inference pipeline: camera frames -> depth -> pseudo-LiDAR.

Capability parity with the reference's three-process ROS graph
(/root/reference/pseudo-lidar/mock_publisher.py ->
DepthPipeline.py -> PseudoLidarPipeline.py, topics camera/kitti ->
depth/output -> PL/output at 10 Hz), re-designed as an in-process
async pipeline:

  * stages communicate through bounded queues (the ROS topics' queue_size=1
    becomes maxsize=1 — latest-wins backpressure);
  * the depth model and the point-cloud projector run as ONE jitted
    device program per frame (the reference crosses host/ROS boundaries
    between them);
  * sources/sinks are plain callables, with a FileImageSource replaying a
    KITTI drive directory exactly like mock_publisher.py:53-83, and an
    optional rate limit reproducing the 10 Hz cadence.

A thin ROS adapter can wrap DepthToPointCloudPipeline.push()/on_cloud at
the edges; the core never imports ROS.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
import time
from dataclasses import dataclass
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import PseudoLiDAR
from unsupervised_pseuso_lidar_tpu.utils.transforms import load_image


class FileImageSource:
    """Replays the PNGs of a KITTI drive directory (mock camera).

    Parity: /root/reference/pseudo-lidar/mock_publisher.py:53-83."""

    def __init__(self, image_dir: str, rate_hz: Optional[float] = None,
                 size_hw: Optional[Tuple[int, int]] = None,
                 normalize: bool = True):
        self.paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
        if not self.paths:
            raise FileNotFoundError(f"No PNGs under {image_dir}")
        self.rate_hz = rate_hz
        self.size_hw = size_hw
        self.normalize = normalize

    def __iter__(self) -> Iterator[np.ndarray]:
        period = 1.0 / self.rate_hz if self.rate_hz else 0.0
        next_t = time.monotonic()
        for path in self.paths:
            img, _, _ = load_image(path, self.size_hw, normalize=self.normalize)
            if period:
                next_t += period
                delay = next_t - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
            yield img


@dataclass
class PipelineResult:
    frame_index: int
    depth: np.ndarray          # [H, W] meters
    points: np.ndarray         # [N, 4] velodyne-frame pseudo-LiDAR cloud
    stream_index: int = 0      # camera index on a multi-camera rig


class DepthToPointCloudPipeline:
    """depth-model + pseudo-LiDAR projector as one fused device program.

    Args:
      depth_fn: callable [1, H, W, 3] -> [1, H, W] depth in meters (e.g. a
        jitted model apply composed with disp_to_depth).
      projector: a PseudoLiDAR instance (calibration-bound).
    """

    def __init__(self, depth_fn: Callable, projector: PseudoLiDAR,
                 depth_fn_args: tuple = ()):
        self.projector = projector
        # depth_fn_args lets callers pass model variables as jit ARGUMENTS
        # instead of closures — large arrays baked into the executable as
        # constants are re-streamed per call on tunneled devices.
        self._depth_args = depth_fn_args

        def fused(args, img):
            depth = depth_fn(*args, img) if args else depth_fn(img)
            points, valid = projector.project_batch(depth)
            return depth, points, valid

        self._fused = jax.jit(fused)

    def process(self, img: np.ndarray, frame_index: int = 0) -> PipelineResult:
        depth, points, valid = self._fused(self._depth_args, jnp.asarray(img)[None])
        depth = np.asarray(depth[0])
        cloud = np.asarray(points[0])[np.asarray(valid[0])]
        return PipelineResult(frame_index, depth, cloud)

    def process_batch(self, imgs: np.ndarray, frame_index: int = 0):
        """Multi-camera step: [S, H, W, 3] synchronized frames (one per
        stream) -> one fused device program -> per-stream results.

        Batching the rig's cameras into a single forward amortizes launch
        latency and fills the MXU far better than S sequential b1 calls
        (benchmarks row 6b: per-stream BTS latency at batch 4 vs 1).
        """
        depth, points, valid = self._fused(self._depth_args, jnp.asarray(imgs))
        depth = np.asarray(depth)
        points = np.asarray(points)
        valid = np.asarray(valid)
        return [
            PipelineResult(frame_index, depth[s], points[s][valid[s]],
                           stream_index=s)
            for s in range(depth.shape[0])
        ]

    def _stream(self, payloads, handle: Callable[[int, np.ndarray], None],
                queue_size: int) -> int:
        """Shared streaming loop: a feed thread pushes enumerated payloads
        through a bounded latest-wins queue (the ROS nodes' queue_size=1
        semantics — stale items are dropped under load) into `handle`.
        A source that raises mid-stream still terminates the loop (the
        sentinel is enqueued unconditionally) and its exception re-raises
        here instead of hanging the consumer."""
        q: "queue.Queue" = queue.Queue(maxsize=queue_size)
        sentinel = object()
        failure: list = []

        def feed():
            try:
                for item in enumerate(payloads):
                    try:
                        q.put_nowait(item)
                    except queue.Full:
                        try:  # drop the stale item, keep the fresh one
                            q.get_nowait()
                        except queue.Empty:
                            pass
                        q.put(item)
            except BaseException as exc:  # propagate to the consumer
                failure.append(exc)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=feed, daemon=True)
        thread.start()

        processed = 0
        while True:
            item = q.get()
            if item is sentinel:
                if failure:
                    raise failure[0]
                return processed
            index, payload = item
            handle(index, payload)
            processed += 1

    def run(
        self,
        source: Iterator[np.ndarray],
        on_result: Callable[[PipelineResult], None],
        queue_size: int = 1,
    ) -> int:
        """Stream frames through the pipeline with a latest-wins input
        queue (the ROS queue_size=1 semantics); returns frames processed."""
        return self._stream(
            source,
            lambda i, frame: on_result(self.process(frame, i)),
            queue_size,
        )

    def run_multi(
        self,
        sources,
        on_result: Callable[[PipelineResult], None],
        queue_size: int = 1,
    ) -> int:
        """Stream a multi-camera rig: N sources in lockstep (synchronized
        capture), each rig step batched into ONE device program. Latest-
        wins queue semantics as in run(); `on_result` fires once per
        stream per step (PipelineResult.stream_index identifies the
        camera). Returns rig steps processed; stops at the shortest
        source (a rig frame needs all cameras)."""

        def handle(i, frames):
            for result in self.process_batch(frames, i):
                on_result(result)

        return self._stream(
            (np.stack(frames) for frames in zip(*sources)), handle, queue_size
        )
