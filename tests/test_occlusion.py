"""Occlusion / moving-object oracle tests for the monodepth2-family
objective (per-pixel-min reprojection + binary automasking).

The reference scaffolds this objective but never activates it
(/root/reference/losses.py:147-167, automask commented out); here it is
first-class (losses/reprojection.min_reprojection_loss) and these tests
prove — against a closed-form occluded scene — that it does the job it
exists for:

  * a STATIC foreground object parallax-shifts between views, so the
    background next to it is occluded in exactly one reference view:
    the per-pixel MIN over refs must stay near zero at ground truth
    while the per-pixel MEAN pays the occlusion penalty;
  * a CAMERA-LOCKED object (same pixels in every view) has zero identity
    error and nonzero reprojection error at ground truth: automasking
    must remove exactly those pixels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_pseuso_lidar_tpu.data.synthetic import synthetic_triplet_batch
from unsupervised_pseuso_lidar_tpu.geometry.se3 import pose_matrix
from unsupervised_pseuso_lidar_tpu.geometry.warp import (
    sample_with_impl,
    warp_coords,
)
from unsupervised_pseuso_lidar_tpu.losses.photometric import photometric_loss
from unsupervised_pseuso_lidar_tpu.losses.reprojection import (
    min_reprojection_loss,
)

B, H, W = 2, 64, 128
FOCAL, DEPTH, TX, OCC_DEPTH = 100.0, 10.0, 0.3, 5.0


def _scene(occluder):
    return synthetic_triplet_batch(
        B, H, W, seed=3, depth=DEPTH, tx=TX, focal=FOCAL,
        occluder=occluder, occ_depth=OCC_DEPTH,
    )


def _per_ref_errors(data):
    """Photometric error maps of both GT-warped refs: ([2B,H,W] err,
    identity err) using the same pieces min_reprojection_loss composes."""
    tgt = jnp.asarray(data["tgt"])
    refs = jnp.asarray(data["ref_imgs"])
    k = jnp.asarray(data["intrinsics"])
    poses = jnp.asarray(data["oxts"])
    depth_full = jnp.asarray(data["groundtruth"])

    t0 = pose_matrix(poses[:, 0])
    t1 = pose_matrix(poses[:, 1])
    src = jnp.concatenate([refs[:, 0], refs[:, 1]], axis=0)
    transform = jnp.concatenate([t0, t1], axis=0)
    coords = warp_coords(
        jnp.tile(depth_full, (2, 1, 1)), transform, jnp.tile(k, (2, 1, 1))
    )
    warped = sample_with_impl(src, coords, impl="gather")
    err = photometric_loss(
        warped, jnp.tile(tgt, (2, 1, 1, 1)), clip_loss=0.0
    ).mean(axis=-1)
    ident = photometric_loss(
        src, jnp.tile(tgt, (2, 1, 1, 1)), clip_loss=0.0
    ).mean(axis=-1)
    return np.asarray(err), np.asarray(ident)


class TestOccludedRenderer:
    def test_static_patch_parallax(self):
        data = _scene("static")
        mask = data["occ_mask"][0]
        assert mask.any() and not mask.all()
        # GT depth is the patch depth inside the mask
        np.testing.assert_allclose(
            data["groundtruth"][0][mask], OCC_DEPTH
        )
        # the patch's image extent parallax-shifts between views by
        # focal*tx/occ_depth = 6 px: the views differ inside/near the box
        shift = FOCAL * TX / OCC_DEPTH
        cols = np.where(mask.any(axis=0))[0]
        tgt_row = data["tgt"][0][H // 2]
        ref0_row = data["ref_imgs"][0, 0][H // 2]
        # ref0 (camera at -tx) sees the patch shifted right by 6 px:
        # the column just left of the tgt box is background in tgt but
        # still background in ref0; the column at box_right + shift/2 is
        # patch in ref0 but background in tgt
        probe = int(cols[-1] + shift / 2)
        assert abs(tgt_row[probe] - ref0_row[probe]).max() > 0.05

    def test_camera_locked_identical_pixels(self):
        data = _scene("camera_locked")
        mask = data["occ_mask"][0]
        # the object travels with the camera: all three views show the
        # same patch at the same pixels
        np.testing.assert_allclose(
            data["tgt"][0][mask], data["ref_imgs"][0, 0][mask]
        )
        np.testing.assert_allclose(
            data["tgt"][0][mask], data["ref_imgs"][0, 1][mask]
        )

    def test_unknown_kind_rejected(self):
        with pytest.raises(ValueError, match="occluder"):
            synthetic_triplet_batch(1, 16, 32, occluder="warp_speed")


class TestMinHandlesOcclusion:
    def test_min_beats_mean_at_ground_truth(self):
        data = _scene("static")
        err, _ = _per_ref_errors(data)
        err0, err1 = err[:B], err[B:]
        # central crop (exclude image borders where the warp leaves the
        # frame — that is coverage's business, not occlusion's)
        sl = np.s_[:, 8:-8, 8:-8]
        min_err = np.minimum(err0, err1)[sl].mean()
        mean_err = (0.5 * (err0 + err1))[sl].mean()
        # occlusion hits exactly one ref per pixel: the min stays near
        # the clean-scene floor, the mean pays the penalty
        assert min_err < 0.5 * mean_err
        clean_err, _ = _per_ref_errors(_scene(None))
        clean_floor = np.minimum(clean_err[:B], clean_err[B:])[sl].mean()
        assert min_err < clean_floor + 0.01

    def test_public_api_min_loss_near_clean_floor(self):
        occ = _scene("static")
        clean = _scene(None)

        def api_loss(data):
            return float(
                min_reprojection_loss(
                    jnp.asarray(data["tgt"]),
                    [jnp.asarray(data["ref_imgs"][:, 0]),
                     jnp.asarray(data["ref_imgs"][:, 1])],
                    [jnp.asarray(data["groundtruth"])[..., None]],
                    jnp.asarray(data["oxts"]),
                    jnp.asarray(data["intrinsics"]),
                    automask=False,
                )
            )

        assert api_loss(occ) < api_loss(clean) + 0.02


class TestAutomaskHandlesCameraLocked:
    def test_mask_removes_locked_object(self):
        data = _scene("camera_locked")
        err, ident = _per_ref_errors(data)
        err_min = np.minimum(err[:B], err[B:])
        ident_min = np.minimum(ident[:B], ident[B:])
        mask = err_min < ident_min  # the automask keep-pixels
        occ = data["occ_mask"]
        inner = occ & np.roll(occ, 4, axis=2) & np.roll(occ, -4, axis=2)
        border = ~occ
        border[:, :, :8] = border[:, :, -8:] = False
        # inside the locked object: identity error is exactly zero, the
        # warp moves a nonzero-error patch there -> masked OUT
        assert mask[inner].mean() < 0.2
        # static background: reprojection beats identity -> kept
        assert mask[border].mean() > 0.7

    def test_public_api_automask_lowers_loss(self):
        data = _scene("camera_locked")
        args = (
            jnp.asarray(data["tgt"]),
            [jnp.asarray(data["ref_imgs"][:, 0]),
             jnp.asarray(data["ref_imgs"][:, 1])],
            [jnp.asarray(data["groundtruth"])[..., None]],
            jnp.asarray(data["oxts"]),
            jnp.asarray(data["intrinsics"]),
        )
        with_mask = float(min_reprojection_loss(*args, automask=True))
        without = float(min_reprojection_loss(*args, automask=False))
        assert with_mask < 0.8 * without


class TestAutomaskWarmup:
    """ident_scale semantics (the automask_warmup ramp's loss-level knob)
    and the automask_keep health metric."""

    def _args(self, occluder="camera_locked"):
        data = _scene(occluder)
        return (
            jnp.asarray(data["tgt"]),
            [jnp.asarray(data["ref_imgs"][:, 0]),
             jnp.asarray(data["ref_imgs"][:, 1])],
            [jnp.asarray(data["groundtruth"])[..., None]],
            jnp.asarray(data["oxts"]),
            jnp.asarray(data["intrinsics"]),
        )

    def test_huge_ident_scale_equals_automask_off(self):
        # static occluder: the identity error is nonzero everywhere (the
        # whole scene parallax-shifts), so an unreachable ident recovers
        # the automask-free loss. A camera-locked patch is the deliberate
        # exception: its identity error is EXACTLY zero and the
        # multiplicative ramp keeps it masked at any scale — early
        # supervision there would be wrong (no geometry explains it).
        args = self._args("static")
        warmup = float(
            min_reprojection_loss(*args, automask=True, ident_scale=1e4)
        )
        off = float(min_reprojection_loss(*args, automask=False))
        np.testing.assert_allclose(warmup, off, rtol=1e-5)

    def test_zero_ident_pixels_stay_masked_at_any_scale(self):
        # the camera-locked patch (identity error == 0) must remain
        # automasked even mid-warmup: the ramp scales ONLY the identity
        # term (0 * scale) and adds the 1e-5 tie-break after, so the
        # patch's threshold stays 1e-5 at every warmup scale — far below
        # its reprojection error at ground truth
        args = self._args("camera_locked")
        warmup = float(
            min_reprojection_loss(*args, automask=True, ident_scale=1e4)
        )
        off = float(min_reprojection_loss(*args, automask=False))
        assert warmup < off

    def test_unit_ident_scale_is_exact_automask(self):
        args = self._args()
        scaled = float(
            min_reprojection_loss(*args, automask=True, ident_scale=1.0)
        )
        plain = float(min_reprojection_loss(*args, automask=True))
        np.testing.assert_allclose(scaled, plain, rtol=1e-7)

    def test_keep_metric_reflects_ident_scale(self):
        args = self._args("camera_locked")
        def keep(scale):
            _, cov = min_reprojection_loss(
                *args, automask=True, ident_scale=scale,
                warp_impl="mxu", with_coverage=True,
            )
            return float(cov["automask_keep"])

        # unreachable identity term -> everything except the zero-ident
        # locked patch (which stays masked at any scale, by design)
        # keeps its gradient
        assert keep(1e4) > 0.9
        # exact automask -> strictly fewer kept than mid-warmup
        assert keep(1.0) < keep(1e4) - 0.01
        assert 0.0 <= keep(1.0) <= 1.0
