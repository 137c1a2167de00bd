"""Real-image learning evidence: depth-only training on the dinosaur
turntable (the reference's toy-problem oracle, 36 real photographs with
calibrated projection matrices).

Parity role: /root/reference/notes/toy_problem/ trains its forked stack
on exactly this data (dataloaders.py:32-54 loads the .ppm frames and
RQ-factors dino_Ps.mat). Here the SAME capability runs through the main
framework: `decompose_projection` (with the chirality flip the Oxford
cameras need), ground-truth relative poses through the `semi_sup_pose`
path, and the standard jitted train step — depth is the only thing
learned, so photometric convergence on real images exercises the whole
geometry/loss/kernel stack with no synthetic-renderer shortcuts.

The reference's recorded warp evidence (images/warping.txt:1-3) is the
comparison row: mean |tgt - warp| = 0.00699 on its trained KITTI model.
This script reports the same statistic (on [0, 1]-scaled images) on the
turntable after a short depth-only fit.

Data is read in place from /root/reference (never copied); the script
degrades to a clear skip message when the data or scipy is unavailable.

Usage: python examples/dino_turntable.py [--steps 400]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DINO_ROOT = "/root/reference/notes/toy_problem"


def _axis_angle(rot):
    """Host-side SO(3) log map (numpy): rotation matrix -> axis*angle."""
    import numpy as np

    cos = np.clip((np.trace(rot) - 1.0) / 2.0, -1.0, 1.0)
    angle = np.arccos(cos)
    if angle < 1e-8:
        return np.zeros(3)
    axis = (
        np.array(
            [
                rot[2, 1] - rot[1, 2],
                rot[0, 2] - rot[2, 0],
                rot[1, 0] - rot[0, 1],
            ]
        )
        / (2.0 * np.sin(angle))
    )
    return axis * angle


def load_dino(height: int = 192, width: int = 256, root: str = DINO_ROOT):
    """Triplet batch over the whole turntable sequence.

    Returns a dict shaped like `synthetic_triplet_batch` output (uint8
    images; the train step normalizes on device): tgt [B, H, W, 3],
    ref_imgs [B, 2, H, W, 3], intrinsics [B, 3, 3], oxts [B, 2, 6]
    (ground-truth tgt->ref poses, axis-angle + translation), or None if
    the dataset/scipy is unavailable.
    """
    import numpy as np

    try:
        from PIL import Image
        from scipy.io import loadmat
    except ImportError:
        return None
    mat = os.path.join(root, "utils", "dino_Ps.mat")
    if not os.path.exists(mat):
        return None

    from unsupervised_pseuso_lidar_tpu.geometry.calibration import (
        decompose_projection,
    )

    projections = loadmat(mat)["P"]
    num = projections.shape[1]
    # the object sits on the turntable axis at ~(0, 0, -0.66); any point
    # in front works for the chirality fix
    front = np.array([0.0, 0.0, -0.6582])
    cams = [
        decompose_projection(np.asarray(projections[0, i]), front_point=front)
        for i in range(num)
    ]

    # reference crops columns to 650 (dataloaders.py:71) before its
    # transforms; mirror that, then resize to a static TPU-friendly size
    crop_w = 650
    imgs = []
    src_h = None
    for i in range(num):
        img = Image.open(os.path.join(root, "images", f"viff.{i:03d}.ppm"))
        if src_h is None:
            src_h = img.size[1]
        elif img.size[1] != src_h:
            raise ValueError(
                f"frame {i} height {img.size[1]} != {src_h}: the shared "
                "intrinsics rescale assumes a constant frame size"
            )
        img = img.crop((0, 0, crop_w, src_h)).resize(
            (width, height), Image.BILINEAR
        )
        imgs.append(np.asarray(img, np.uint8))
    imgs = np.stack(imgs)
    sx, sy = width / crop_w, height / src_h
    scale = np.diag([sx, sy, 1.0])

    tgts, refs, intr, oxts = [], [], [], []
    for t in range(1, num - 1):
        k_t, r_t, tt_t = cams[t]
        pose_t = np.eye(4)
        pose_t[:3, :3] = r_t
        pose_t[:3, 3] = tt_t
        vecs = []
        for r in (t - 1, t + 1):
            _, r_r, tt_r = cams[r]
            pose_r = np.eye(4)
            pose_r[:3, :3] = r_r
            pose_r[:3, 3] = tt_r
            rel = pose_r @ np.linalg.inv(pose_t)  # x_ref = rel @ x_tgt
            vecs.append(
                np.concatenate([_axis_angle(rel[:3, :3]), rel[:3, 3]])
            )
        tgts.append(imgs[t])
        refs.append(np.stack([imgs[t - 1], imgs[t + 1]]))
        intr.append(scale @ k_t)
        oxts.append(np.stack(vecs))
    return {
        "tgt": np.stack(tgts),
        "ref_imgs": np.stack(refs),
        "intrinsics": np.stack(intr).astype(np.float32),
        "oxts": np.stack(oxts).astype(np.float32),
    }


def run(steps: int = 400, batch: int = 8, height: int = 192,
        width: int = 256, verbose: bool = True, trajectory: bool = False):
    """Depth-only fit on the turntable; returns (initial, final) mean
    photometric warp error |tgt - warp(ref0)| on [0, 1]-scaled images —
    or (initial, final, [(step, abs_err, signed_err), ...]) when
    trajectory=True — abs_err is mean|tgt-warp| on valid pixels;
    signed_err is the reference's literal recorded statistic
    (tgt - warp).mean() whose KITTI value is 0.00699
    (/root/reference/images/warping.txt:1-3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unsupervised_pseuso_lidar_tpu.geometry.se3 import pose_matrix
    from unsupervised_pseuso_lidar_tpu.geometry.warp import (
        disp_to_depth,
        inverse_warp_from_matrix,
    )
    from unsupervised_pseuso_lidar_tpu.train.config import Config
    from unsupervised_pseuso_lidar_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    data = load_dino(height, width)
    if data is None:
        print("dino dataset unavailable (needs /root/reference and scipy)")
        return None
    num = data["tgt"].shape[0]

    config = Config.from_dict(
        {
            "model": {
                "name": "dino",
                "depth": {"name": "DispResNet"},
                "pose": {"name": "PoseNet"},
            },
            "datasets": {
                "augmentation": {
                    "image_width": width, "image_height": height
                },
            },
            "action": {"batch_size": batch, "learning_rate": 1e-4},
        }
    )
    state, depth_model, pose_model, tx = create_train_state(
        config, jax.random.PRNGKey(0), 1000
    )
    # gather warp: the turntable's 10-degree steps produce flows beyond
    # the banded kernels' training envelope, and this is an accuracy
    # artifact, not a throughput one
    # depth_norm: the turntable scene's metric scale is ~1 unit (0.17/frame
    # ego-arc at 10 deg/frame), far from disp_to_depth's ~0.2 raw-init
    # depth — with torch-parity init (constant sigma~0.47 at step 0) every
    # raw-depth warp sample lands out of frame and the 'mean' objective
    # parks in its zeros-warp basin (loss flat at mean|tgt|, r4 measured).
    # Per-image mean-normalized depth warps at scale ~1 from step 0 (the
    # production conditioning, losses/total.py:normalize_depth); the known
    # OXTS poses are already in scene units so nothing else moves.
    step = make_train_step(
        depth_model, pose_model, tx, donate=False, warp_impl="gather",
        semi_sup_pose=True, smooth_on="disp", smooth_weight=1e-3,
        depth_norm=True,
    )

    batches = []
    for start in range(0, num - batch + 1, batch):
        idx = np.arange(start, start + batch)
        batches.append(
            {k: jnp.asarray(v[idx]) for k, v in data.items()}
        )

    from unsupervised_pseuso_lidar_tpu.losses.total import normalize_depth
    from unsupervised_pseuso_lidar_tpu.train.trainer import (
        normalize_uint8_batch,
    )

    @jax.jit
    def warp_err(params, stats, b):
        img = b["tgt"].astype(jnp.float32) / 255.0
        ref = b["ref_imgs"][:, 0].astype(jnp.float32) / 255.0
        disps = depth_model.apply(
            {"params": params["depth"], "batch_stats": stats["depth"]},
            normalize_uint8_batch(b)["tgt"],
            train=False,
        )
        depth = disp_to_depth(disps[0][..., 0])
        # warp with the SAME per-image mean-normalized depth the training
        # objective uses (monocular depth is scale-ambiguous; the raw
        # 1/(10s+0.01) scale is meaningless in the turntable's units)
        depth = normalize_depth(depth)
        t0 = pose_matrix(b["oxts"][:, 0])
        warped = inverse_warp_from_matrix(
            ref, depth, t0, b["intrinsics"], impl="gather"
        )
        valid = (jnp.abs(warped).sum(-1, keepdims=True) > 0).astype(
            jnp.float32
        )
        abs_err = jnp.sum(jnp.abs(warped - img) * valid) / (
            jnp.sum(valid) * 3.0
        )
        # the reference's LITERAL recorded statistic — a SIGNED mean over
        # the whole tensor, invalid (zero-filled) pixels included, where
        # positive and negative residuals cancel:
        #   print((tgt - projected_img).mean()) : 0.00699
        # (/root/reference/images/warping.txt:1). Reported alongside the
        # strictly-harsher |.|-on-valid metric above.
        signed_err = jnp.mean(img - warped)
        return abs_err, signed_err

    e = warp_err(state.params, state.batch_stats, batches[0])
    err0, signed0 = float(e[0]), float(e[1])
    curve = [(0, round(err0, 5), round(signed0, 5))]
    s = state
    for i in range(steps):
        s, m = step(s, batches[i % len(batches)])
        if (i + 1) % 100 == 0:
            e = warp_err(s.params, s.batch_stats, batches[0])
            err_i, signed_i = float(e[0]), float(e[1])
            curve.append((i + 1, round(err_i, 5), round(signed_i, 5)))
            if verbose:
                print(
                    f"step {i+1}: loss={float(m['loss']):.4f} "
                    f"warp_err={err_i:.5f} signed={signed_i:.5f}",
                    flush=True,
                )
    e = warp_err(s.params, s.batch_stats, batches[0])
    err1, signed1 = float(e[0]), float(e[1])
    if verbose:
        print(
            f"dino warp |tgt-warp| mean (valid px): {err0:.5f} -> "
            f"{err1:.5f}; reference-statistic signed mean "
            f"(tgt-warp).mean(): {signed0:.5f} -> {signed1:.5f} "
            f"(reference's recorded KITTI value of the same expression: "
            f"0.00699, images/warping.txt:1)"
        )
    if trajectory:
        return err0, err1, curve
    return err0, err1


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=400)
    args = parser.parse_args()
    run(steps=args.steps)
