"""Synthetic KITTI-like triplet generator with known geometry.

The reference's only test harness is a ROS mock publisher replaying real
KITTI PNGs (/root/reference/pseudo-lidar/mock_publisher.py:53-83) and a
"toy problem" turntable set with known projection matrices
(/root/reference/notes/toy_problem/). This module plays both roles for the
rebuilt stack without needing KITTI on disk: a procedurally-textured
fronto-parallel plane observed by a translating camera, so that

  * the photometric warp has an exact closed-form inverse (a pure pixel
    shift of fx*tx/depth), and
  * ground-truth depth and ground-truth poses are known exactly, letting
    end-to-end tests assert that training actually learns them.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


def _texture(u: np.ndarray, v: np.ndarray, phases: np.ndarray) -> np.ndarray:
    """Smooth multiscale texture in [0, 1]; u, v in pixels, phases [K, 4]."""
    img = np.zeros((*u.shape, 3), dtype=np.float32)
    for k, (fu, fv, pu, pv) in enumerate(phases):
        channel = k % 3
        img[..., channel] += np.sin(u * fu + pu) * np.cos(v * fv + pv)
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img.astype(np.float32)


def synthetic_triplet_batch(
    batch_size: int,
    height: int,
    width: int,
    seed: int = 0,
    depth: float = 10.0,
    tx: float = 0.3,
    focal: float = 100.0,
) -> Dict[str, np.ndarray]:
    """One batch of (tgt, refs, intrinsics, oxts, groundtruth).

    The camera translates along +x by -tx (to ref0) and +tx (to ref1); for
    a fronto-parallel plane at `depth`, ref images are exact pixel shifts
    of the target by ±focal*tx/depth.
    """
    rng = np.random.default_rng(seed)
    shift = focal * tx / depth

    vv, uu = np.meshgrid(
        np.arange(height, dtype=np.float32),
        np.arange(width, dtype=np.float32),
        indexing="ij",
    )
    tgt = np.zeros((batch_size, height, width, 3), dtype=np.float32)
    refs = np.zeros((batch_size, 2, height, width, 3), dtype=np.float32)
    for b in range(batch_size):
        phases = np.stack(
            [
                rng.uniform(0.02, 0.3, 6),
                rng.uniform(0.02, 0.3, 6),
                rng.uniform(0, 2 * np.pi, 6),
                rng.uniform(0, 2 * np.pi, 6),
            ],
            axis=-1,
        )
        tgt[b] = _texture(uu, vv, phases)
        # ref observed from camera translated by t: its pixel u sees the
        # texture at u + fx*t/d relative to the target camera.
        refs[b, 0] = _texture(uu - shift, vv, phases)  # camera at -tx
        refs[b, 1] = _texture(uu + shift, vv, phases)  # camera at +tx

    k = np.array(
        [[focal, 0, width / 2.0], [0, focal, height / 2.0], [0, 0, 1]],
        dtype=np.float32,
    )
    intrinsics = np.broadcast_to(k, (batch_size, 3, 3)).copy()

    # target->ref 6-DoF ground-truth poses (axis-angle zero, translation):
    # warping ref0 into tgt samples ref0 at u + fx*px/d; ref0[u] = tex(u -
    # s) so the aligning pose has px = -tx ... sign follows the warp math.
    oxts = np.zeros((batch_size, 2, 6), dtype=np.float32)
    oxts[:, 0, 3] = tx
    oxts[:, 1, 3] = -tx

    groundtruth = np.full((batch_size, height, width), depth, dtype=np.float32)

    return {
        "tgt": tgt,
        "ref_imgs": refs,
        "intrinsics": intrinsics,
        "oxts": oxts,
        "groundtruth": groundtruth,
    }


class SyntheticTripletDataset:
    """Iterable dataset of synthetic triplet batches (deterministic per
    seed/epoch) exposing the same batch schema as the KITTI pipeline."""

    def __init__(
        self,
        num_batches: int,
        batch_size: int,
        height: int,
        width: int,
        seed: int = 0,
        depth: float = 10.0,
        tx: float = 0.3,
        uint8_images: bool = False,
    ):
        self.num_batches = num_batches
        self.batch_size = batch_size
        self.height = height
        self.width = width
        self.seed = seed
        self.depth = depth
        self.tx = tx
        self.uint8_images = uint8_images

    def __len__(self) -> int:
        return self.num_batches * self.batch_size

    def batches(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(self.num_batches):
            batch = synthetic_triplet_batch(
                self.batch_size,
                self.height,
                self.width,
                seed=self.seed + epoch * self.num_batches + i,
                depth=self.depth,
                tx=self.tx,
            )
            if self.uint8_images:
                batch["tgt"] = (batch["tgt"] * 255).astype(np.uint8)
                batch["ref_imgs"] = (batch["ref_imgs"] * 255).astype(np.uint8)
            yield batch
