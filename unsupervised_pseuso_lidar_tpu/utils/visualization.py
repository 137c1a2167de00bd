"""Warp/depth visualization for training debugging.

Parity: /root/reference/trainer.py:204-240 (log_depth_predictions,
log_warps — which write warped images and depth maps to images/) without
matplotlib: pure-numpy colorization + PNG via PIL, callable from the
trainer or notebooks.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from unsupervised_pseuso_lidar_tpu.utils.transforms import unnormalize_image


def depth_to_image(depth: np.ndarray, max_percentile: float = 95.0) -> np.ndarray:
    """Depth map -> uint8 turbo-ish colormap (disparity-scaled, like the
    reference's plt.imsave of 1/disp)."""
    inv = 1.0 / np.maximum(np.asarray(depth, dtype=np.float32), 1e-6)
    hi = np.percentile(inv, max_percentile)
    x = np.clip(inv / max(hi, 1e-6), 0.0, 1.0)
    # simple 3-stop colormap: dark blue -> yellow -> red
    r = np.clip(2.0 * x, 0, 1)
    g = np.clip(2.0 * x - 0.5, 0, 1) * (x < 0.75) + np.clip(4 * (1 - x), 0, 1) * (
        x >= 0.75
    )
    b = np.clip(1.0 - 2.0 * x, 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def image_to_uint8(img: np.ndarray, normalized: bool = True) -> np.ndarray:
    """NHWC float image (optionally ImageNet-normalized) -> uint8."""
    img = np.asarray(img, dtype=np.float32)
    if normalized:
        img = unnormalize_image(img)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def save_warp_visualization(
    out_dir: str,
    step: int,
    tgt: np.ndarray,
    warped: np.ndarray,
    depth: np.ndarray,
    normalized: bool = True,
) -> Dict[str, str]:
    """Write tgt / warped / depth PNGs for one sample; returns the paths.

    Parity role of /root/reference/trainer.py:214-240 (log_warps) which
    writes images/warping/*.png and images/depth/*.png."""
    from PIL import Image

    os.makedirs(os.path.join(out_dir, "warping"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    paths = {}
    pairs = {
        os.path.join(out_dir, "warping", f"tgt_{step:06d}.png"): image_to_uint8(
            tgt, normalized
        ),
        os.path.join(out_dir, "warping", f"warp_{step:06d}.png"): image_to_uint8(
            warped, normalized
        ),
        os.path.join(out_dir, "depth", f"depth_{step:06d}.png"): depth_to_image(
            depth
        ),
    }
    for path, arr in pairs.items():
        Image.fromarray(arr).save(path)
        paths[os.path.basename(path)] = path
    return paths
