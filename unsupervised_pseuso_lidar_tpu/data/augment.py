"""On-device training augmentations (jittable, triplet-consistent).

The reference leaves augmentation as a TODO ("Add color jitters",
/root/reference/trainer.py:90-91). Done here the TPU way: augmentations
run INSIDE the jitted train step on device (no extra host bandwidth, no
host RNG), keyed deterministically off the training step.

Photometric-consistency invariant: the monocular loss compares warped
reference pixels against target pixels, so any color transform must be
IDENTICAL across the three frames of a triplet — per-sample parameters
are drawn once and broadcast over (tgt, ref0, ref1). Horizontal flips
likewise flip all three frames AND mirror the intrinsics' principal
point; flipping is only valid when the pose is predicted (the pose net
sees a coherently mirrored scene), not with ground-truth OXTS poses.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def color_jitter(
    rng: jax.Array,
    tgt: jax.Array,
    refs: jax.Array,
    brightness: float = 0.2,
    contrast: float = 0.2,
) -> Tuple[jax.Array, jax.Array]:
    """Per-sample brightness/contrast jitter, identical across the triplet.

    Operates in normalized image space (affine transforms commute with
    ImageNet normalization up to reparameterization).

    Args:
      tgt: [B, H, W, 3]; refs: [B, 2, H, W, 3] (float).
    """
    batch = tgt.shape[0]
    k_b, k_c = jax.random.split(rng)
    add = jax.random.uniform(
        k_b, (batch, 1, 1, 1), minval=-brightness, maxval=brightness,
        dtype=tgt.dtype,
    )
    scale = jax.random.uniform(
        k_c, (batch, 1, 1, 1), minval=1.0 - contrast, maxval=1.0 + contrast,
        dtype=tgt.dtype,
    )
    tgt = tgt * scale + add
    refs = refs * scale[:, None] + add[:, None]
    return tgt, refs


def horizontal_flip(
    rng: jax.Array,
    tgt: jax.Array,
    refs: jax.Array,
    intrinsics: jax.Array,
    prob: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-sample horizontal flip of the whole triplet + mirrored cx.

    cx' = (W - 1) - cx keeps the pinhole model consistent with the
    flipped pixel grid. Also returns the per-sample flip mask so callers
    can mirror any co-registered arrays (e.g. sparse depth ground truth)
    with the same decisions.
    """
    batch, _, width, _ = tgt.shape
    flip = jax.random.bernoulli(rng, prob, (batch,))

    def maybe_flip(img, f):
        return jnp.where(f[:, None, None, None], img[:, :, ::-1, :], img)

    tgt = maybe_flip(tgt, flip)
    refs = jnp.stack(
        [maybe_flip(refs[:, i], flip) for i in range(refs.shape[1])], axis=1
    )
    new_cx = (width - 1) - intrinsics[:, 0, 2]
    cx = jnp.where(flip, new_cx, intrinsics[:, 0, 2])
    intrinsics = intrinsics.at[:, 0, 2].set(cx)
    return tgt, refs, intrinsics, flip


def augment_batch(
    step: jax.Array,
    batch: Dict[str, jax.Array],
    jitter: bool = True,
    flip: bool = False,
    seed: int = 0,
) -> Dict[str, jax.Array]:
    """Apply the enabled augmentations; rng derived from (seed, step) so
    steps are reproducible. Images must already be float (post-normalize
    path of forward_batch handles uint8 before calling this)."""
    rng = jax.random.fold_in(jax.random.PRNGKey(seed), step)
    tgt, refs = batch["tgt"], batch["ref_imgs"]
    intrinsics = batch["intrinsics"]
    out = dict(batch)
    if flip:
        rng, k = jax.random.split(rng)
        tgt, refs, intrinsics, flipped = horizontal_flip(
            k, tgt, refs, intrinsics
        )
        if "groundtruth" in batch:
            # mirror the sparse depth GT with the SAME per-sample
            # decisions (a supervised term would otherwise compare
            # flipped predictions against unflipped truth)
            gt = batch["groundtruth"]
            out["groundtruth"] = jnp.where(
                flipped[:, None, None], gt[:, :, ::-1], gt
            )
        if "oxts" in batch:
            # GT relative poses conjugate by the mirror M = diag(-1,1,1):
            # axis-angle v -> (vx,-vy,-vz), translation t -> (-tx,ty,tz)
            # (tested: pose_matrix(v') == M @ pose_matrix(v) @ M). Without
            # this, semi_sup_pose / pose-eval would warp mirrored images
            # with geometrically wrong poses on ~half the samples.
            mirror = jnp.asarray([1.0, -1.0, -1.0, -1.0, 1.0, 1.0],
                                 dtype=batch["oxts"].dtype)
            out["oxts"] = jnp.where(
                flipped[:, None, None],
                batch["oxts"] * mirror,
                batch["oxts"],
            )
    if jitter:
        rng, k = jax.random.split(rng)
        tgt, refs = color_jitter(k, tgt, refs)
    return dict(out, tgt=tgt, ref_imgs=refs, intrinsics=intrinsics)
