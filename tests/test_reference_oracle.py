"""Reference-oracle parity: the reference's OWN executable code as oracle.

Unlike tests/test_parity.py (which checks against an independently written
torch baseline), every oracle here is imported straight from
/root/reference — the CPU-runnable modules of the codebase we claim parity
with — and run on identical inputs:

  * geometry/pose_geometry.py: euler2mat, mat2euler, disp_to_depth,
    pose_vec2mat, invert_pose, transformation_from_parameters,
    rot_from_axisangle, inverse_warp (with the transform.py:134 `.cuda()`
    hardcode patched to a no-op — the only change needed to run it on CPU)
  * losses.py: smooth_loss and the full reprojection_loss/forward pipeline
  * geometry/calibration.py: Calibration
  * geometry/oxts_parser.py: load_oxts_packets_and_poses, load_velo_scan
  * evaluate.py: compute_errors (metric formulas; its disp_to_depth
    plumbing is patched out — it crashes on any real shape, which is why
    the reference's own validation loop is disabled, SURVEY.md §3.2)
  * prep_split_files.py: kitti_depth_annotated_prepare
  * pseudo-lidar/utils/PseudoLiDAR.py: project_PL
  * pseudo-lidar/Transform/Transform.py: project_velo_to_img

Known, documented deviations NOT asserted equal here:
  * evaluate.py:36 assigns rms to the "sq_rel" key (we assert the bug is
    present in the oracle and that our sq_rel is the true formula);
  * losses.py:199-203 compares the backward warp against refs[1] instead
    of refs[0] (a list-mutation accident); the full-pipeline test passes
    IDENTICAL ref frames so the accident and the intent coincide;
  * Transform.project_velo_to_img keeps the LAST point per pixel, ours
    keeps the NEAREST — the test uses collision-free clouds;
  * PseudoLiDAR sparsity strides after compaction, ours strides the pixel
    index — sparsity=0 is compared exactly, sparsity>0 as a subset.
"""

from __future__ import annotations

import os
import sys
import importlib
import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not present"
)

RNG = np.random.default_rng(2024)


def _load_by_path(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _RefModules:
    """Imported reference modules + the patches needed to run them on CPU."""

    def __init__(self):
        self._orig_cuda = torch.Tensor.cuda
        # the ONLY patch the geometry/loss path needs: transform.py:134
        # hardcodes .cuda() on an internal ones tensor
        torch.Tensor.cuda = lambda self, *a, **k: self
        sys.path.insert(0, REF)
        self._imported = []
        for name in (
            "geometry",
            "geometry.transform",
            "geometry.pose_geometry",
            "geometry.calibration",
            "geometry.oxts_parser",
            "utils",
            "utils.transforms",
            "losses",
            "evaluate",
            "prep_split_files",
        ):
            if name in sys.modules:
                del sys.modules[name]
            sys.modules[name] = importlib.import_module(name)
            self._imported.append(name)
        self.pose_geometry = sys.modules["geometry.pose_geometry"]
        self.calibration = sys.modules["geometry.calibration"]
        self.oxts_parser = sys.modules["geometry.oxts_parser"]
        self.losses = sys.modules["losses"]
        self.evaluate = sys.modules["evaluate"]
        self.prep_split_files = sys.modules["prep_split_files"]
        # the dashed pseudo-lidar dir is not a package: load by path
        self.PseudoLiDAR = _load_by_path(
            "_ref_pseudolidar", os.path.join(REF, "pseudo-lidar/utils/PseudoLiDAR.py")
        )
        self.Transform = _load_by_path(
            "_ref_transform", os.path.join(REF, "pseudo-lidar/Transform/Transform.py")
        )
        self._imported += ["_ref_pseudolidar", "_ref_transform"]

    def close(self):
        torch.Tensor.cuda = self._orig_cuda
        if REF in sys.path:
            sys.path.remove(REF)
        for name in self._imported:
            sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def ref():
    mods = _RefModules()
    yield mods
    mods.close()


# ---------------------------------------------------------------------------
# synthetic KITTI calibration fixture (realistic 2011_09_26 values)
# ---------------------------------------------------------------------------

_CAM_TO_CAM = """calib_time: 09-Jan-2012 13:57:47
corner_dist: 9.950000e-02
K_02: 9.597910e+02 0.000000e+00 6.960217e+02 0.000000e+00 9.569251e+02 2.241806e+02 0.000000e+00 0.000000e+00 1.000000e+00
R_rect_02: 9.998817e-01 1.511453e-02 -2.841595e-03 -1.511724e-02 9.998853e-01 -9.338510e-04 2.827154e-03 9.766976e-04 9.999955e-01
P_rect_02: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
P: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
"""

_VELO_TO_CAM = """calib_time: 15-Mar-2012 11:37:16
R: 7.533745e-03 -9.999714e-01 -6.166020e-04 1.480249e-02 7.280733e-04 -9.998902e-01 9.998621e-01 7.523790e-03 1.480755e-02
T: -4.069766e-03 -7.631618e-02 -2.717806e-01
"""

_IMU_TO_VELO = """calib_time: 25-May-2012 16:47:16
R: 9.999976e-01 7.553071e-04 -2.035826e-03 -7.854027e-04 9.998898e-01 -1.482298e-02 2.024406e-03 1.482454e-02 9.998881e-01
T: -8.086759e-01 3.195559e-01 -7.997231e-01
"""


@pytest.fixture(scope="module")
def calib_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("calib")
    (d / "calib_cam_to_cam.txt").write_text(_CAM_TO_CAM)
    (d / "calib_velo_to_cam.txt").write_text(_VELO_TO_CAM)
    (d / "calib_imu_to_velo.txt").write_text(_IMU_TO_VELO)
    return str(d)


# ---------------------------------------------------------------------------
# calibration + OXTS + velodyne IO
# ---------------------------------------------------------------------------


def test_calibration_matches_reference(ref, calib_dir):
    theirs = ref.calibration.Calibration(calib_dir + os.sep)

    from unsupervised_pseuso_lidar_tpu.geometry.calibration import Calibration

    ours = Calibration(calib_dir)
    np.testing.assert_allclose(ours.K.ravel(), theirs.K, rtol=0)
    np.testing.assert_allclose(ours.P, theirs.P, rtol=0)
    np.testing.assert_allclose(ours.R_rect, theirs.R_rect, rtol=0)
    np.testing.assert_allclose(ours.T_velo_cam, theirs.T_velo_cam, rtol=0)
    np.testing.assert_allclose(ours.T_imu_velo, theirs.T_imu_velo, rtol=0)


def _oxts_line(rng) -> str:
    vals = [
        -37.9 + rng.uniform(-1e-3, 1e-3),   # lat
        145.1 + rng.uniform(-1e-3, 1e-3),   # lon
        40.0 + rng.uniform(-1, 1),          # alt
        rng.uniform(-0.05, 0.05),           # roll
        rng.uniform(-0.05, 0.05),           # pitch
        rng.uniform(-3.1, 3.1),             # yaw
    ] + list(rng.uniform(-2, 2, 19)) + [4, 9, 5, 5, 6]
    return " ".join(
        f"{v:.9f}" if i < 25 else str(int(v)) for i, v in enumerate(vals)
    )


def test_oxts_poses_match_reference(ref, tmp_path):
    rng = np.random.default_rng(7)
    files = []
    for i in range(3):
        p = tmp_path / f"{i:010d}.txt"
        p.write_text(_oxts_line(rng) + "\n")
        files.append(str(p))

    theirs = ref.oxts_parser.load_oxts_packets_and_poses(files)

    from unsupervised_pseuso_lidar_tpu.geometry.oxts import (
        load_oxts_packets_and_poses,
    )

    ours = load_oxts_packets_and_poses(files)
    assert len(ours) == len(theirs) == 3
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-9)


def test_velo_scan_loader_matches_reference(ref, tmp_path):
    scan = RNG.uniform(-50, 50, (1000, 4)).astype(np.float32)
    path = tmp_path / "scan.bin"
    scan.tofile(path)

    from unsupervised_pseuso_lidar_tpu.geometry.oxts import load_velo_scan

    np.testing.assert_array_equal(
        load_velo_scan(str(path)), ref.oxts_parser.load_velo_scan(str(path))
    )


# ---------------------------------------------------------------------------
# SE(3) algebra
# ---------------------------------------------------------------------------


def test_euler2mat_matches_reference(ref):
    angles = RNG.uniform(-1.2, 1.2, (6, 3)).astype(np.float32)
    theirs = ref.pose_geometry.euler2mat(torch.from_numpy(angles)).numpy()

    from unsupervised_pseuso_lidar_tpu.geometry.se3 import euler2mat

    np.testing.assert_allclose(
        np.asarray(euler2mat(jnp.asarray(angles))), theirs, atol=1e-6
    )


def test_mat2euler_matches_reference(ref):
    from unsupervised_pseuso_lidar_tpu.geometry.oxts import rotx, roty, rotz
    from unsupervised_pseuso_lidar_tpu.geometry.se3 import mat2euler

    for _ in range(5):
        x, y, z = RNG.uniform(-1.0, 1.0, 3)
        rot = rotz(z) @ roty(y) @ rotx(x)  # the OXTS Rz·Ry·Rx convention
        theirs = ref.pose_geometry.mat2euler(rot)
        ours = np.asarray(mat2euler(jnp.asarray(rot)))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_pose_vec2mat_matches_reference(ref):
    vec = RNG.uniform(-0.5, 0.5, (4, 6)).astype(np.float32)
    theirs = ref.pose_geometry.pose_vec2mat(torch.from_numpy(vec)).numpy()

    from unsupervised_pseuso_lidar_tpu.geometry.se3 import pose_vec2mat

    np.testing.assert_allclose(
        np.asarray(pose_vec2mat(jnp.asarray(vec))), theirs, atol=1e-6
    )


def test_rot_from_axisangle_matches_reference(ref):
    vec = RNG.uniform(-0.8, 0.8, (5, 1, 3)).astype(np.float32)
    theirs = ref.pose_geometry.rot_from_axisangle(torch.from_numpy(vec)).numpy()

    from unsupervised_pseuso_lidar_tpu.geometry.se3 import rot_from_axisangle

    np.testing.assert_allclose(
        np.asarray(rot_from_axisangle(jnp.asarray(vec))), theirs, atol=1e-6
    )


@pytest.mark.parametrize("invert", [False, True])
def test_transformation_from_parameters_matches_reference(ref, invert):
    axisangle = RNG.uniform(-0.5, 0.5, (4, 1, 3)).astype(np.float32)
    translation = RNG.uniform(-2, 2, (4, 1, 3)).astype(np.float32)
    theirs = ref.pose_geometry.transformation_from_parameters(
        torch.from_numpy(axisangle), torch.from_numpy(translation), invert
    ).numpy()

    from unsupervised_pseuso_lidar_tpu.geometry.se3 import (
        transformation_from_parameters,
    )

    ours = transformation_from_parameters(
        jnp.asarray(axisangle), jnp.asarray(translation), invert=invert
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_invert_pose_matches_reference(ref):
    from unsupervised_pseuso_lidar_tpu.geometry.se3 import (
        invert_pose,
        pose_matrix,
    )

    vec = RNG.uniform(-0.4, 0.4, (4, 6)).astype(np.float32)
    pose = pose_matrix(jnp.asarray(vec))
    theirs = ref.pose_geometry.invert_pose(
        torch.from_numpy(np.asarray(pose))
    ).numpy()
    np.testing.assert_allclose(np.asarray(invert_pose(pose)), theirs, atol=1e-6)


def test_disp_to_depth_matches_reference(ref):
    disps = [
        [RNG.uniform(0.01, 0.95, (2, 1, 8, 10)).astype(np.float32) for _ in range(2)]
        for _ in range(2)
    ]
    theirs = ref.pose_geometry.disp_to_depth(
        [[torch.from_numpy(d) for d in time] for time in disps]
    )

    from unsupervised_pseuso_lidar_tpu.geometry.warp import disp_to_depth

    for t in range(2):
        for s in range(2):
            np.testing.assert_allclose(
                np.asarray(disp_to_depth(jnp.asarray(disps[t][s]))),
                theirs[t][s].numpy(),
                rtol=1e-6,
            )


# ---------------------------------------------------------------------------
# the differentiable warp + loss pipeline
# (batch MUST be 4: the reference hardcodes K_hom.repeat(4,..),
#  /root/reference/geometry/transform.py:110)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pose_inv", [False, True])
def test_inverse_warp_matches_reference(ref, pose_inv):
    b, h, w = 4, 32, 40
    img = RNG.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    depth = RNG.uniform(4, 12, (b, h, w)).astype(np.float32)
    pose = RNG.uniform(-0.05, 0.05, (b, 6)).astype(np.float32)
    k = np.broadcast_to(
        np.array([[35.0, 0, 20], [0, 35.0, 16], [0, 0, 1]], np.float32),
        (b, 3, 3),
    ).copy()

    theirs = ref.pose_geometry.inverse_warp(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(depth),
        torch.from_numpy(pose),
        torch.from_numpy(k),
        pose_inv,
    ).permute(0, 2, 3, 1).numpy()

    from unsupervised_pseuso_lidar_tpu.geometry.warp import inverse_warp

    ours = inverse_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(pose),
        jnp.asarray(k), invert_pose=pose_inv,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-4)


def _loss_inputs(num_scales=4, b=4, h=32, w=40):
    tgt = RNG.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    # identical ref frames: makes the reference's backward-direction
    # target accident (losses.py:199-203 compares against refs[1])
    # coincide with the intended refs[0] (module docstring)
    ref_img = RNG.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    disps = [
        [
            RNG.uniform(0.05, 0.9, (b, h >> s, w >> s, 1)).astype(np.float32)
            for s in range(num_scales)
        ]
        for _ in range(2)
    ]
    poses = RNG.uniform(-0.04, 0.04, (b, 2, 6)).astype(np.float32)
    k = np.broadcast_to(
        np.array([[35.0, 0, 20], [0, 35.0, 16], [0, 0, 1]], np.float32),
        (b, 3, 3),
    ).copy()
    return tgt, ref_img, disps, poses, k


def test_full_loss_pipeline_matches_reference(ref, capsys):
    """End-to-end oracle: Losses.forward (disp_to_depth -> multi-scale
    bidirectional reprojection with per-scale bilinear depth upsampling ->
    grid_sample warp -> L1; + second-order smoothness) from the
    reference's own losses.py vs our jitted total_loss."""
    tgt, ref_img, disps, poses, k = _loss_inputs()

    t = lambda x: torch.from_numpy(x).permute(0, 3, 1, 2)  # noqa: E731
    with torch.no_grad():
        their_reproj, their_smooth = ref.losses.Losses().forward(
            t(tgt), [t(ref_img), t(ref_img)],
            [[t(d) for d in time] for time in disps],
            torch.from_numpy(poses), torch.from_numpy(k), None,
        )
    capsys.readouterr()  # swallow the reference's per-index print()s

    from unsupervised_pseuso_lidar_tpu.losses.total import total_loss

    our_reproj, our_smooth = total_loss(
        jnp.asarray(tgt), [jnp.asarray(ref_img), jnp.asarray(ref_img)],
        [[jnp.asarray(d) for d in time] for time in disps],
        jnp.asarray(poses), jnp.asarray(k),
    )
    np.testing.assert_allclose(
        float(our_reproj), float(their_reproj), rtol=5e-4
    )
    np.testing.assert_allclose(
        float(our_smooth), float(their_smooth), rtol=5e-4
    )


def test_smooth_loss_matches_reference(ref):
    maps = [
        RNG.uniform(1, 20, (2, 16 >> s, 20 >> s, 1)).astype(np.float32)
        for s in range(3)
    ]
    theirs = ref.losses.Losses().smooth_loss(
        [torch.from_numpy(m).permute(0, 3, 1, 2) for m in maps]
    )

    from unsupervised_pseuso_lidar_tpu.losses.smoothness import smooth_loss

    np.testing.assert_allclose(
        float(smooth_loss([jnp.asarray(m) for m in maps])),
        float(theirs),
        rtol=1e-5,
    )


# ---------------------------------------------------------------------------
# eval metric formulas
# ---------------------------------------------------------------------------


def test_compute_errors_matches_reference(ref, monkeypatch):
    # evaluate.py:11 pipes the prediction through disp_to_depth, which
    # returns a nested LIST — .cpu() on it crashes for every real shape
    # (why the reference's validation loop is disabled, trainer.py:285).
    # Patch it to identity to reach the metric formulas, which are the
    # oracle under test; our caller converts disparity ahead of time.
    monkeypatch.setattr(ref.evaluate, "disp_to_depth", lambda x: x)
    gt = RNG.uniform(2.0, 70.0, (48, 64)).astype(np.float32)
    pred = np.clip(
        gt * RNG.uniform(0.7, 1.4, gt.shape), 1.0, 79.0
    ).astype(np.float32)
    theirs = ref.evaluate.compute_errors(
        torch.from_numpy(gt), [torch.from_numpy(pred)]
    )

    from unsupervised_pseuso_lidar_tpu.eval.metrics import compute_errors

    ours = compute_errors(jnp.asarray(gt), jnp.asarray(pred))
    for key in ("silog", "abs_rel", "log10", "rms", "log_rms", "d1", "d2", "d3"):
        np.testing.assert_allclose(
            float(ours[key]), float(theirs[key]), rtol=1e-4,
            err_msg=key,
        )
    # the documented reference bug: its "sq_rel" key carries rms
    # (evaluate.py:36); ours is the true squared relative error
    assert float(theirs["sq_rel"]) == float(theirs["rms"])
    true_sq_rel = float(np.mean((gt - pred) ** 2 / gt))
    np.testing.assert_allclose(float(ours["sq_rel"]), true_sq_rel, rtol=1e-4)


# ---------------------------------------------------------------------------
# pseudo-LiDAR projection
# ---------------------------------------------------------------------------


def test_pseudolidar_project_PL_matches_reference(ref, calib_dir):
    theirs_proj = ref.PseudoLiDAR.PseudoLiDAR(calib_dir + os.sep, sparsity=0)
    depth = RNG.uniform(1.0, 80.0, (64, 96)).astype(np.float64)
    theirs = theirs_proj.project_PL(depth)

    from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import PseudoLiDAR

    ours = PseudoLiDAR(calib_dir, sparsity=0).project_PL(depth)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-3)


def test_pseudolidar_sparsity_is_subset_of_reference_cloud(ref, calib_dir):
    # documented deviation: reference strides AFTER compaction
    # (PseudoLiDAR.py:107-109), we stride the pixel index (static shapes);
    # every sparsified point must still be a point of the full cloud
    depth = RNG.uniform(1.0, 80.0, (32, 48)).astype(np.float64)
    full = ref.PseudoLiDAR.PseudoLiDAR(calib_dir + os.sep, sparsity=0).project_PL(depth)

    from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import PseudoLiDAR

    sparse = PseudoLiDAR(calib_dir, sparsity=4).project_PL(depth)
    assert 0 < len(sparse) < len(full)
    # every sparsified point coincides (up to f32 rounding) with a point
    # of the reference's full cloud
    dists = np.linalg.norm(
        full[None, :, :3] - sparse[:, None, :3].astype(np.float64), axis=-1
    ).min(axis=1)
    assert dists.max() < 1e-3, dists.max()


def test_velo_to_img_matches_reference(ref, calib_dir):
    width, height = 96, 64
    theirs_t = ref.Transform.Transform(calib_dir + os.sep, width, height)

    # collision-free cloud: one point per distinct pixel, away from integer
    # truncation boundaries (the float32 path must truncate identically)
    proj = theirs_t.P
    velo_to_cam = theirs_t.T
    rng = np.random.default_rng(3)
    us = rng.choice(np.arange(2, width - 2), 40, replace=False)
    vs = rng.choice(np.arange(2, height - 2), 40, replace=False)
    w_coord = rng.uniform(5, 60, 40)
    uf = us + rng.uniform(0.25, 0.75, 40)
    vf = vs + rng.uniform(0.25, 0.75, 40)
    z = w_coord - proj[2, 3]
    x = (uf * w_coord - proj[0, 2] * z - proj[0, 3]) / proj[0, 0]
    y = (vf * w_coord - proj[1, 2] * z - proj[1, 3]) / proj[1, 1]
    cam_hom = np.stack([x, y, z, np.ones_like(z)], axis=1)
    velo = (np.linalg.inv(velo_to_cam) @ cam_hom.T).T[:, :3]
    assert (velo[:, 0] > 0).all()  # KITTI geometry: cam-z forward ~ velo-x

    theirs = theirs_t.project_velo_to_img(velo.copy())

    from unsupervised_pseuso_lidar_tpu.pseudolidar.velo2img import (
        project_velo_to_depth_image,
    )

    ours = np.asarray(
        project_velo_to_depth_image(
            jnp.asarray(velo, dtype=jnp.float32),
            jnp.asarray(velo_to_cam, dtype=jnp.float32),
            jnp.asarray(proj, dtype=jnp.float32),
            width, height,
        )
    )
    assert ours.shape == theirs.shape == (height, width)
    assert (ours > 0).sum() == (theirs > 0).sum() == 40
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# split preparation
# ---------------------------------------------------------------------------


def test_split_prep_matches_reference(ref, tmp_path):
    drive = "2011_09_26_drive_0001_sync"  # 26 chars: the reference slices
    date = drive[:10]                      # folder[-26:-16] for the date
    img_dir = tmp_path / date / drive / "image_02" / "data"
    img_dir.mkdir(parents=True)
    for i in range(12):
        (img_dir / f"{i:010d}.png").write_bytes(b"")
    ann_dir = (
        tmp_path / "data_depth_annotated" / "train" / drive
        / "proj_depth" / "groundtruth" / "image_02"
    )
    ann_dir.mkdir(parents=True)
    # interior frames only: the reference checks neighbors at +-1 but
    # WRITES +-3 (prep_split_files.py:45-52) and would IndexError at edges
    for i in (4, 5, 7):
        (ann_dir / f"{i:010d}.png").write_bytes(b"")

    their_out = tmp_path / "ref_split.txt"
    ref.prep_split_files.kitti_depth_annotated_prepare(
        kitti_dir=str(tmp_path) + "/", destination_dir=str(their_out)
    )

    from unsupervised_pseuso_lidar_tpu.data.splits import (
        kitti_depth_annotated_prepare,
    )

    our_out = tmp_path / "our_split.txt"
    # ref_offset=3 = what the reference actually WRITES (its intent per the
    # emitted files; the +-1 existence check is the documented bug)
    kitti_depth_annotated_prepare(
        str(tmp_path), str(tmp_path / "data_depth_annotated"),
        str(our_out), split="train", ref_offset=3,
    )

    their_lines = [
        line.split() for line in their_out.read_text().splitlines() if line.strip()
    ]
    our_lines = [
        line.split() for line in our_out.read_text().splitlines() if line.strip()
    ]
    assert their_lines == our_lines
    assert len(our_lines) == 3


# ---------------------------------------------------------------------------
# trainer-level process_batch equivalence (VERDICT r3 next-step 7)
# ---------------------------------------------------------------------------


@pytest.mark.slow  # ~33s warm: two full torch CNN forwards + jax compile
def test_process_batch_matches_reference(ref, capsys):
    """Full trainer-wiring oracle: IDENTICAL weights in both stacks, one
    fixed batch, assert the model outputs AND the total loss match the
    reference's process_batch (/root/reference/trainer.py:290-313: two
    depth forwards + pose forward + Losses.forward) against our
    forward_batch + total_loss. Fails if any of model forward, weight
    import, disp_to_depth, warp, or the loss reduction drifts.

    All three frames are the SAME image, for two reasons:
      * our forward_batch folds [tgt, ref0] into ONE 2B depth pass while
        the reference runs two B passes — under train-mode BatchNorm the
        batch statistics only coincide when tgt == ref0 (the fold is a
        documented throughput deviation, train/trainer.py:forward_batch);
      * the reference's backward-direction target accident
        (losses.py:199-203 compares against refs[1]) coincides with the
        intent only when ref0 == ref1 (same trick as
        test_full_loss_pipeline_matches_reference).
    The warp is still non-trivial: the pose net emits a non-zero pose, so
    warped-vs-target differs everywhere depth/pose weights matter."""
    disp_net = _load_by_path(
        "_ref_dispnet", os.path.join(REF, "models/depth/disp_net.py")
    )
    pose_net = _load_by_path(
        "_ref_posenet", os.path.join(REF, "models/pose/pose_net.py")
    )
    b, h, w = 4, 64, 96  # transform.py:110 hardcodes batch 4
    img = RNG.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    k = np.broadcast_to(
        np.array([[70.0, 0, 48], [0, 70.0, 32], [0, 0, 1]], np.float32),
        (b, 3, 3),
    ).copy()

    torch.manual_seed(7)
    depth_t = disp_net.DispNetS().train()
    pose_t = pose_net.PoseNet(nb_ref_imgs=2).train()
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    # the reference's process_batch, verbatim wiring (trainer.py:290-313)
    disps_t = [depth_t(t_img), depth_t(t_img)]
    poses_t = pose_t(t_img, [t_img, t_img])
    their_reproj, their_smooth = ref.losses.Losses().forward(
        t_img, [t_img, t_img], disps_t, poses_t,
        torch.from_numpy(k), None,
    )
    capsys.readouterr()  # swallow the reference's per-index print()s

    import jax

    from unsupervised_pseuso_lidar_tpu.models.registry import build_model
    from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
        import_torch_state,
    )
    from unsupervised_pseuso_lidar_tpu.train.trainer import forward_batch
    from unsupervised_pseuso_lidar_tpu.losses.total import total_loss

    depth_m = build_model("DispNetS")
    pose_m = build_model("PoseNet")
    dvars = depth_m.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    pvars = pose_m.init(
        jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)),
        [jnp.zeros((1, h, w, 3))] * 2,
    )
    dp, ds = import_torch_state(
        dvars["params"], dvars.get("batch_stats", {}),
        {k_: v.detach().numpy() for k_, v in depth_t.state_dict().items()},
        "DispNetS",
    )
    pp, ps = import_torch_state(
        pvars["params"], pvars.get("batch_stats", {}),
        {k_: v.detach().numpy() for k_, v in pose_t.state_dict().items()},
        "PoseNet",
    )
    batch = {
        "tgt": jnp.asarray(img),
        "ref_imgs": jnp.stack([jnp.asarray(img)] * 2, axis=1),
        "intrinsics": jnp.asarray(k),
    }
    disps_tgt, disps_ref0, poses_j, _ = forward_batch(
        depth_m, pose_m,
        {"depth": dp, "pose": pp}, {"depth": ds, "pose": ps},
        batch, train=True,
    )

    # model outputs match the torch forwards bit-for-bit-ish
    np.testing.assert_allclose(
        np.asarray(poses_j), poses_t.detach().numpy(), atol=1e-5
    )
    for ours_d, theirs_d in zip(disps_tgt, disps_t[0]):
        np.testing.assert_allclose(
            np.asarray(ours_d)[..., 0], theirs_d.detach().numpy()[:, 0],
            atol=1e-4,
        )

    our_reproj, our_smooth = total_loss(
        batch["tgt"], [batch["tgt"], batch["tgt"]],
        [disps_tgt, disps_ref0], poses_j, batch["intrinsics"],
    )
    np.testing.assert_allclose(
        float(our_reproj), float(their_reproj), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(our_smooth), float(their_smooth), rtol=2e-3
    )
