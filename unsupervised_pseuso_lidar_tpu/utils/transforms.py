"""Host-side image transforms (numpy / PIL).

Parity with the reference torchvision pipeline
(/root/reference/trainer.py:97-103: ToTensor -> Resize -> Normalize with
ImageNet statistics, GT depth skipping normalization at
dataloaders.py:42-47) and utils/transforms.py:1-15 (UnNormalize).
"""

from __future__ import annotations

import hashlib
import os
import threading
from typing import Optional, Tuple
from uuid import uuid4

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


def load_image(
    path: str,
    size_hw: Optional[Tuple[int, int]] = None,
    normalize: bool = True,
) -> Tuple[np.ndarray, int, int]:
    """Load an image -> float32 HWC in [0,1] (optionally ImageNet
    normalized), resized with bilinear like torchvision Resize.

    Returns (image, original_height, original_width) — the originals feed
    the intrinsics rescale (/root/reference/dataloaders.py:95-98).
    """
    from PIL import Image

    img = Image.open(path)
    orig_w, orig_h = img.size
    if size_hw is not None and (orig_h, orig_w) != size_hw:
        img = img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    arr = arr / 255.0
    if normalize:
        arr = normalize_image(arr)
    return arr, orig_h, orig_w


def load_depth_png(
    path: str, size_hw: Optional[Tuple[int, int]] = None
) -> np.ndarray:
    """Load a KITTI depth_annotated PNG -> float32 HW depth in meters.

    KITTI stores depth * 256 as uint16; 0 means no measurement. Resizing
    uses NEAREST to avoid mixing valid and invalid pixels.

    (Deviation, documented: the reference feeds the raw uint16 PNG values
    through its image pipeline without the /256 scaling,
    dataloaders.py:42-47 — its metrics were never in meters, part of why
    its validation is disabled. SURVEY.md §3.2.)
    """
    from PIL import Image

    img = Image.open(path)
    if size_hw is not None and (img.size[1], img.size[0]) != size_hw:
        img = img.resize((size_hw[1], size_hw[0]), Image.NEAREST)
    return np.asarray(img, dtype=np.float32) / 256.0


def load_image_uint8(
    path: str, size_hw: Optional[Tuple[int, int]] = None
) -> Tuple[np.ndarray, int, int]:
    """Load an image as raw uint8 HWC (resized, NOT normalized).

    The training pipeline ships these bytes to the device and normalizes
    there — 4x less host->device bandwidth than fp32, which dominates when
    the transport link is the bottleneck (see train/trainer.forward_batch).
    """
    from PIL import Image

    img = Image.open(path)
    orig_w, orig_h = img.size
    if size_hw is not None and (orig_h, orig_w) != size_hw:
        img = img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr, orig_h, orig_w


def load_image_uint8_cached(
    path: str,
    size_hw: Optional[Tuple[int, int]],
    cache_dir: str,
) -> Tuple[np.ndarray, int, int]:
    """load_image_uint8 with a decoded-array disk cache.

    PNG decode + bilinear resize costs ~50-100 ms/image on a single host
    core — with 36 images per batch-12 triplet that is seconds per step of
    pure host decode, starving the chip (SURVEY.md §7 risk: the reference
    re-decodes in DataLoader workers every epoch,
    /root/reference/dataloaders.py:74-120). First touch decodes and writes
    a .npz of the resized uint8 array (~0.4 MB at 640x192, ~30x smaller
    than re-decoding work); later epochs read it back in ~1 ms.
    """
    key = hashlib.sha1(
        f"{os.path.abspath(path)}|{size_hw}".encode()
    ).hexdigest()
    cpath = os.path.join(cache_dir, key + ".npz")
    if os.path.exists(cpath):
        try:
            with np.load(cpath) as data:
                return data["img"], int(data["h"]), int(data["w"])
        except Exception:  # truncated/corrupt entry: re-decode and heal
            pass
    arr, orig_h, orig_w = load_image_uint8(path, size_hw)
    os.makedirs(cache_dir, exist_ok=True)
    # unique per writer: THREAD workers share a pid, and neighboring
    # triplets share frames, so two threads can decode the same path
    # concurrently — a pid-only suffix made one writer clobber (and then
    # os.replace fail on) the other's tmp file
    tmp = cpath + f".tmp{os.getpid()}-{threading.get_ident()}-{uuid4().hex[:8]}"
    with open(tmp, "wb") as f:  # atomic publish: decode races write twice,
        np.savez(f, img=arr, h=orig_h, w=orig_w)  # never read half a file
    os.replace(tmp, cpath)
    return arr, orig_h, orig_w


def normalize_image(img: np.ndarray) -> np.ndarray:
    """ImageNet-normalize a float HWC image in [0, 1]."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def unnormalize_image(img: np.ndarray) -> np.ndarray:
    """Inverse of normalize_image (for visualization)."""
    return img * IMAGENET_STD + IMAGENET_MEAN
