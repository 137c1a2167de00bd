"""KITTI raw dataset: split-file indexing, calib/OXTS caching, batching.

Capability parity with /root/reference/dataloaders.py:19-251
(KittiDataset, UnSupKittiDataset, UnSupStackedDataset), redesigned:

  * Robust path parsing: the calib directory is found by locating the
    KITTI date component (YYYY_MM_DD) in the image path and the OXTS file
    by substituting image_02/data -> oxts/data — replacing the reference's
    hardcoded character offsets ([:29], [0:55] with per-machine comments,
    dataloaders.py:152,162).
  * Calibration and the imu->cam composite are parsed once per drive date
    and cached (the reference re-parses three calib files per split line,
    dataloaders.py:152-155).
  * OXTS world poses are converted to camera-frame 6-DoF odometry on the
    host at index time, so the hot loop ships only decoded pixels.
  * Deterministic shuffle/split matches the reference semantics
    (np seed -> shuffle indices -> [split:] train / [:split] val,
    trainer.py:172-191).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from unsupervised_pseuso_lidar_tpu.geometry.calibration import Calibration
from unsupervised_pseuso_lidar_tpu.geometry.oxts import (
    load_oxts_packets_and_poses,
    relative_pose_6dof,
)
from unsupervised_pseuso_lidar_tpu.utils.transforms import (
    load_depth_png,
    load_image,
    load_image_uint8,
)

_DATE_RE = re.compile(r"(\d{4}_\d{2}_\d{2})")


def find_calib_dir(image_path: str) -> str:
    """Locate the drive-date directory holding the calib txt files."""
    m = _DATE_RE.search(image_path)
    if not m:
        raise ValueError(f"No KITTI date component in path: {image_path}")
    end = image_path.index(m.group(1)) + len(m.group(1))
    return image_path[:end]


def oxts_path_for_image(image_path: str) -> str:
    """image_02/data/xxx.png -> oxts/data/xxx.txt for the same frame."""
    frame = os.path.splitext(os.path.basename(image_path))[0]
    drive_dir = os.path.dirname(os.path.dirname(os.path.dirname(image_path)))
    return os.path.join(drive_dir, "oxts", "data", frame + ".txt")


# Process-pool plumbing: the dataset is shipped to each worker ONCE via
# the pool initializer (fork shares it copy-on-write; initargs pickle once
# per worker), and tasks submit only (index, flag) — submitting the bound
# method would pickle the whole dataset (all Sample records + calib cache)
# through the call queue per sample.
_WORKER_DATASET = None


def _worker_init(dataset) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_load(index: int, with_groundtruth: bool):
    return _WORKER_DATASET.load_sample(index, with_groundtruth)


@dataclass
class Sample:
    tgt: str
    ref_imgs: Tuple[str, str]
    oxts: Tuple[str, str, str]  # (tgt, ref0, ref1)
    intrinsics: np.ndarray  # [3,3] P_rect_02[:, :3]
    imu_to_cam: np.ndarray  # [4,4]
    groundtruth: Optional[str]


class UnSupKittiDataset:
    """Split-file driven dataset yielding training triplets.

    Split line format (parity /root/reference/dataloaders.py:147-169):
      <tgt.png> <ref0.png> <ref1.png> <gt_depth.png>
    """

    def __init__(self, config, transforms=None, uint8_images: bool = True):
        self.split = config.datasets.split
        self.img_width = config.datasets.augmentation.image_width
        self.img_height = config.datasets.augmentation.image_height
        self.seq_len = config.datasets.sequence_length
        # ship raw uint8 to the device and normalize there (4x less
        # host->device bandwidth; the train/eval steps handle both dtypes)
        self.uint8_images = uint8_images
        # decoded-uint8 disk cache: PNG decode dominates host time after
        # epoch 1 otherwise (datasets.cache_dir, '' = off)
        self.cache_dir = getattr(config.datasets, "cache_dir", "") or ""
        # rasterize GT from raw velodyne scans when the split line has no
        # annotated-depth column (reference TODO, dataloaders.py:174-175)
        self.velo_gt = bool(getattr(config.datasets, "velo_gt", False))
        self.samples: List[Sample] = []
        self._calib_cache: Dict[str, Calibration] = {}
        self._init_samples()

    def _calibration(self, calib_dir: str) -> Calibration:
        if calib_dir not in self._calib_cache:
            self._calib_cache[calib_dir] = Calibration(calib_dir)
        return self._calib_cache[calib_dir]

    def _init_samples(self) -> None:
        if not os.path.isfile(self.split):
            raise FileNotFoundError(
                f"Split file not found: {self.split!r}. Shipped splits live "
                "in ./splits/ (kitti_mac.txt smoke split, "
                "kitti_depth_annotated_test_files.txt eval split); generate "
                "a training split from a KITTI data_depth_annotated "
                "download with "
                "unsupervised_pseuso_lidar_tpu.data.splits."
                "kitti_depth_annotated_prepare."
            )
        with open(self.split, "r") as f:
            lines = [line.strip() for line in f if line.strip()]
        for line in lines:
            parts = line.split()
            if len(parts) < 3:
                raise ValueError(f"Malformed split line: {line!r}")
            tgt, ref0, ref1 = parts[0], parts[1], parts[2]
            gt = parts[3] if len(parts) > 3 else None
            if gt is None and self.velo_gt:
                from unsupervised_pseuso_lidar_tpu.data.velo_gt import (
                    velo_path_for_image,
                )

                velo = velo_path_for_image(tgt)
                if os.path.isfile(velo):
                    gt = velo  # .bin suffix routes __getitem__ to rasterize
            calib_dir = find_calib_dir(tgt)
            try:
                calib = self._calibration(calib_dir)
            except (FileNotFoundError, NotADirectoryError) as e:
                raise FileNotFoundError(
                    f"KITTI drive data missing for split {self.split!r}: "
                    f"no calibration under {calib_dir!r} (first missing "
                    f"file: {e}). Download the KITTI raw drives referenced "
                    "by the split (see docs/PARITY_RUNBOOK.md) or pass "
                    "--synthetic to train without KITTI."
                ) from e
            self.samples.append(
                Sample(
                    tgt=tgt,
                    ref_imgs=(ref0, ref1),
                    oxts=(
                        oxts_path_for_image(tgt),
                        oxts_path_for_image(ref0),
                        oxts_path_for_image(ref1),
                    ),
                    intrinsics=calib.intrinsics.astype(np.float32),
                    imu_to_cam=calib.imu_to_cam,
                    groundtruth=gt,
                )
            )

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return self.load_sample(index, with_groundtruth=True)

    def load_sample(
        self, index: int, with_groundtruth: bool = True
    ) -> Dict[str, np.ndarray]:
        """One sample dict; with_groundtruth=False skips GT materialization
        (training batches drop GT anyway, and velodyne-GT rasterization
        dispatches to the JAX backend — per-sample wasted host time at
        best, a fork-after-backend-init hazard in process workers at
        worst)."""
        sample = self.samples[index]
        size = (self.img_height, self.img_width)

        if self.uint8_images and self.cache_dir:
            from unsupervised_pseuso_lidar_tpu.utils.transforms import (
                load_image_uint8_cached,
            )

            loader = lambda p, s: load_image_uint8_cached(p, s, self.cache_dir)
        else:
            loader = load_image_uint8 if self.uint8_images else load_image
        tgt, orig_h, orig_w = loader(sample.tgt, size)
        refs = np.stack(
            [loader(p, size)[0] for p in sample.ref_imgs], axis=0
        )

        intrinsics = sample.intrinsics.copy()
        intrinsics[0] *= self.img_width / orig_w
        intrinsics[1] *= self.img_height / orig_h

        world_poses = load_oxts_packets_and_poses(sample.oxts)
        oxts = np.stack(
            [
                relative_pose_6dof(world_poses[0], world_poses[1], sample.imu_to_cam),
                relative_pose_6dof(world_poses[0], world_poses[2], sample.imu_to_cam),
            ],
            axis=0,
        )

        img_dtype = np.uint8 if self.uint8_images else np.float32
        out = {
            "tgt": tgt.astype(img_dtype),
            "ref_imgs": refs.astype(img_dtype),
            "intrinsics": intrinsics.astype(np.float32),
            "oxts": oxts.astype(np.float32),
        }
        if sample.groundtruth is not None and with_groundtruth:
            if sample.groundtruth.endswith(".bin"):
                from unsupervised_pseuso_lidar_tpu.data.velo_gt import (
                    depth_gt_from_velo,
                )

                out["groundtruth"] = depth_gt_from_velo(
                    sample.groundtruth,
                    self._calibration(find_calib_dir(sample.tgt)),
                    self.img_width,
                    self.img_height,
                    orig_size=(orig_h, orig_w),
                )
            else:
                out["groundtruth"] = load_depth_png(sample.groundtruth, size)
        return out

    # ------------------------------------------------------------------
    # loaders (reference create_loaders semantics, trainer.py:172-191)
    # ------------------------------------------------------------------

    def train_val_indices(
        self, seed: int, val_ratio: float, shuffle: bool = True
    ) -> Tuple[List[int], List[int]]:
        indices = list(range(len(self)))
        split = int(np.floor(val_ratio * len(self)))
        if shuffle:
            np.random.default_rng(seed).shuffle(indices)
        return indices[split:], indices[:split]

    def batches(
        self,
        indices: Sequence[int],
        batch_size: int,
        num_workers: int = 8,
        drop_last: bool = True,
        use_processes: bool = False,
        lookahead: int = 2,
        with_groundtruth: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield collated batches, loading samples with a worker pool.

        use_processes: decode in a process pool instead of a thread pool.
        PIL releases the GIL during PNG decode, but resize/normalize and
        the OXTS parse hold it — on many-core production hosts process
        workers keep every core decoding (the reference uses
        DataLoader(num_workers=8) forked workers, trainer.py:187-190).
        Requires a fork-capable platform; samples are dispatched
        `lookahead` batches ahead so decode overlaps device compute.

        with_groundtruth: pass False for training consumers (the trainer
        drops GT from train batches) — it skips GT decode entirely, incl.
        the velodyne rasterizer. When True and any sample carries .bin
        (velodyne) GT, process workers are downgraded to threads: the
        rasterizer dispatches to the JAX backend, which must not run in
        children forked after backend init.
        """
        end = len(indices) - (len(indices) % batch_size if drop_last else 0)
        starts = [
            s for s in range(0, end, batch_size)
            if not (drop_last and len(indices[s : s + batch_size]) < batch_size)
        ]
        if use_processes and with_groundtruth and any(
            self.samples[i].groundtruth is not None
            and self.samples[i].groundtruth.endswith(".bin")
            for i in indices
        ):
            import warnings

            warnings.warn(
                "velodyne-GT rasterization dispatches to JAX and cannot "
                "run in forked process workers; using thread workers for "
                "this (eval) iterator instead",
                stacklevel=2,
            )
            use_processes = False
        if num_workers > 1 and starts:
            if use_processes:
                from concurrent.futures import ProcessPoolExecutor

                # the dataset rides to workers once via the initializer;
                # per-task payload is just (index, flag), and the
                # PIL/numpy load_sample outputs pickle cheaply back
                with ProcessPoolExecutor(
                    max_workers=num_workers,
                    initializer=_worker_init,
                    initargs=(self,),
                ) as pool:
                    yield from self._pipelined(
                        pool, starts, indices, batch_size, lookahead,
                        with_groundtruth, submit_fn=_worker_load,
                    )
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=num_workers) as pool:
                    yield from self._pipelined(pool, starts, indices,
                                               batch_size, lookahead,
                                               with_groundtruth)
        else:
            for start in starts:
                yield collate([
                    self.load_sample(i, with_groundtruth)
                    for i in indices[start : start + batch_size]
                ])

    def _pipelined(self, pool, starts, indices, batch_size, lookahead,
                   with_groundtruth=True, submit_fn=None):
        """Submit `lookahead` batches of load_sample futures ahead of the
        consumer so workers decode batch N+k while the device trains on N.

        submit_fn: picklable callable(index, with_groundtruth) for process
        pools; thread pools default to the bound method (no pickling)."""
        from collections import deque

        load = submit_fn if submit_fn is not None else self.load_sample
        inflight = deque()
        it = iter(starts)

        def submit_next():
            try:
                start = next(it)
            except StopIteration:
                return
            chunk = indices[start : start + batch_size]
            inflight.append([
                pool.submit(load, i, with_groundtruth) for i in chunk
            ])

        for _ in range(max(1, lookahead) + 1):
            submit_next()
        while inflight:
            futures = inflight.popleft()
            items = [f.result() for f in futures]
            submit_next()
            yield collate(items)


class UnSupStackedDataset(UnSupKittiDataset):
    """Sliding-window dataset over raw drive directories (no split file,
    no GT). Parity: /root/reference/dataloaders.py:176-251."""

    def __init__(self, config, transforms=None, uint8_images: bool = True):
        self.root = config.datasets.path
        self.split = None
        self.uint8_images = uint8_images
        self.cache_dir = getattr(config.datasets, "cache_dir", "") or ""
        self.img_width = config.datasets.augmentation.image_width
        self.img_height = config.datasets.augmentation.image_height
        self.seq_len = config.datasets.sequence_length
        self.samples = []
        self._calib_cache = {}
        self._init_samples()

    def _init_samples(self) -> None:
        import glob

        img_dirs: List[str] = []
        for date_dir in sorted(glob.glob(os.path.join(self.root, "*"))):
            if not os.path.isdir(date_dir):
                continue
            for drive in sorted(glob.glob(os.path.join(date_dir, "*_sync"))):
                frames = sorted(
                    glob.glob(os.path.join(drive, "image_02", "data", "*.png"))
                )
                img_dirs.extend(frames)
        mid = self.seq_len // 2
        for i in range(len(img_dirs) - self.seq_len + 1):
            window = img_dirs[i : i + self.seq_len]
            # windows must not span drives
            if len({os.path.dirname(p) for p in window}) != 1:
                continue
            tgt = window[mid]
            refs = tuple(p for j, p in enumerate(window) if j != mid)
            calib_dir = find_calib_dir(tgt)
            calib = self._calibration(calib_dir)
            self.samples.append(
                Sample(
                    tgt=tgt,
                    ref_imgs=refs,  # type: ignore[arg-type]
                    oxts=(
                        oxts_path_for_image(tgt),
                        oxts_path_for_image(refs[0]),
                        oxts_path_for_image(refs[1]),
                    ),
                    intrinsics=calib.intrinsics.astype(np.float32),
                    imu_to_cam=calib.imu_to_cam,
                    groundtruth=None,
                )
            )


def collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of samples into one batch dict."""
    keys = items[0].keys()
    return {k: np.stack([item[k] for item in items], axis=0) for k in keys}
