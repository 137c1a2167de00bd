"""Tests for the same-data reference-vs-ours training harness
(benchmarks/reference_loop.py).

The fast test proves the rendered drive is geometrically consistent (the
whole comparison is meaningless on inconsistent data); the slow test runs
the full four-phase pipeline — including the reference's OWN torch
trainer — at smoke scale.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "reference_loop.py")
REF = "/root/reference"

# dataloaders.py:152 slices sample paths at [:29] and the reference's
# Calibration concats filenames onto the slice without a slash, so the
# slice must end "<date>/" -> root must be exactly 17 chars
TREE_ROOT = "/tmp/rltest_kitti"
SMOKE_ROOT = "/tmp/rlsmoke_kitt"


def _run_phase(argv, timeout):
    return subprocess.run(
        [sys.executable, SCRIPT] + argv,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture
def tree(tmp_path):
    """Smoke-size tree + splits at TREE_ROOT (exact-length constraint)."""
    shutil.rmtree(TREE_ROOT, ignore_errors=True)
    workdir = str(tmp_path / "work")
    # slant 0 and focal*tx/depth = 2 -> consecutive frames are EXACT
    # integer 2-pixel shifts of one another (synthetic.py's closed form)
    res = _run_phase(
        ["tree", "--root", TREE_ROOT, "--workdir", workdir,
         "--height", "48", "--width", "64", "--focal", "100.0",
         "--depth", "10.0", "--tx", "0.2", "--slant-deg", "0.0",
         "--frames", "6"],
        timeout=300,
    )
    assert res.returncode == 0, res.stderr
    yield {"root": TREE_ROOT, "workdir": workdir}
    shutil.rmtree(TREE_ROOT, ignore_errors=True)


def test_tree_frames_are_consistent_views(tree):
    """Consecutive frames must be the SAME scene seen from a translated
    camera: at slant 0 with focal*tx/depth = 2, frame i+1 equals frame i
    shifted left by exactly 2 pixels, and GT is the constant plane."""
    from PIL import Image

    img_dir = os.path.join(
        tree["root"], "2011_09_26", "2011_09_26_drive_0001_sync",
        "image_02", "data",
    )
    f0 = np.asarray(Image.open(os.path.join(img_dir, "0000000000.png")),
                    dtype=np.float32)
    f1 = np.asarray(Image.open(os.path.join(img_dir, "0000000001.png")),
                    dtype=np.float32)
    # frame1 samples the texture 2 source-pixels to the right of frame0
    np.testing.assert_allclose(f1[:, :-2], f0[:, 2:], atol=2.0)
    assert np.abs(f1[:, :-2] - f0[:, 2:]).mean() < 0.51  # uint8 rounding

    gt = np.asarray(
        Image.open(os.path.join(
            tree["root"], "2011_09_26", "2011_09_26_drive_0001_sync",
            "proj_depth", "0000000001.png",
        ))
    ).astype(np.float32) / 256.0
    np.testing.assert_allclose(gt, 10.0, atol=0.01)


def test_split_lines_satisfy_reference_offsets(tree):
    """The reference's loader slices paths at [:29]/[:55]
    (dataloaders.py:152,162); every emitted line must land those slices on
    the calib dir and the drive dir."""
    with open(os.path.join(tree["workdir"], "train_split.txt")) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    assert lines, "empty split"
    for parts in lines:
        assert len(parts) == 4
        assert parts[0][:29].endswith("2011_09_26/")
        assert os.path.isdir(parts[0][:29])
        assert parts[0][:55].endswith("_sync")
        assert os.path.isdir(parts[0][:55])
        for p in parts:
            assert os.path.isfile(p)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference snapshot not present")
def test_reference_loop_smoke(tmp_path):
    """Full four-phase pipeline at smoke scale: the reference's own torch
    trainer AND ours each train a few steps on the shared tree, and the
    report carries finite metrics for both."""
    shutil.rmtree(SMOKE_ROOT, ignore_errors=True)
    workdir = str(tmp_path / "work")
    out = str(tmp_path / "REFLOOP_smoke.json")
    try:
        res = _run_phase(
            ["all", "--root", SMOKE_ROOT, "--workdir", workdir,
             "--height", "64", "--width", "96", "--frames", "6",
             "--epochs", "1", "--backend", "cpu", "--out", out,
             "--ref-timeout", "1500"],
            timeout=3000,
        )
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        with open(out) as f:
            report = json.load(f)
        for side in ("reference", "ours"):
            assert report[side]["steps"] >= 1
            ev = report[side]["eval"]
            for key in ("abs_rel", "rmse", "a1"):
                assert np.isfinite(ev[key]), (side, ev)
        assert report["reference"]["loss_last"] is not None
    finally:
        shutil.rmtree(SMOKE_ROOT, ignore_errors=True)
