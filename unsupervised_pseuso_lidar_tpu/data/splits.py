"""Split-file generation from KITTI data_depth_annotated.

Capability parity with /root/reference/prep_split_files.py:18-55
(kitti_depth_annotated_prepare): for every annotated depth frame, emit a
line "<tgt> <ref-k> <ref+k> <gt_depth>" when the temporal neighbors exist.

Reference-bug policy (documented): the reference checks for neighbors at
±1 frame but writes refs at ±3 (prep_split_files.py:45-52), crashing or
mis-pairing at sequence edges; here the offset is one parameter used for
both the existence check and the written paths.
"""

from __future__ import annotations

import glob
import os
from typing import List


def _frame_path(image_dir: str, index: int) -> str:
    return os.path.join(image_dir, f"{index:010d}.png")


def kitti_depth_annotated_prepare(
    kitti_root: str,
    depth_annotated_root: str,
    output_path: str,
    split: str = "train",
    ref_offset: int = 1,
    camera: str = "image_02",
) -> List[str]:
    """Build a split file pairing raw KITTI frames with annotated depth.

    Args:
      kitti_root: KITTI raw root (date dirs with drive_sync subdirs).
      depth_annotated_root: data_depth_annotated root (train/ or val/ dirs
        of <drive>/proj_depth/groundtruth/<camera>/*.png).
      output_path: where to write the split file.
      split: 'train' or 'val' subdirectory of depth_annotated_root.
      ref_offset: temporal distance of the reference frames (used for BOTH
        the existence check and the emitted paths).
    Returns:
      the list of emitted lines.
    """
    lines: List[str] = []
    gt_glob = os.path.join(
        depth_annotated_root, split, "*", "proj_depth", "groundtruth", camera, "*.png"
    )
    for gt_path in sorted(glob.glob(gt_glob)):
        drive = os.path.basename(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(gt_path))))
        )
        date = drive[:10]
        frame = int(os.path.splitext(os.path.basename(gt_path))[0])
        image_dir = os.path.join(kitti_root, date, drive, camera, "data")
        tgt = _frame_path(image_dir, frame)
        ref0 = _frame_path(image_dir, frame - ref_offset)
        ref1 = _frame_path(image_dir, frame + ref_offset)
        if all(os.path.exists(p) for p in (tgt, ref0, ref1)):
            lines.append(f"{tgt} {ref0} {ref1} {gt_path}")
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with open(output_path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return lines


def raw_drive_split(
    drive_dir: str,
    output_path: str,
    ref_offset: int = 1,
    camera: str = "image_02",
) -> List[str]:
    """Build a GT-less split ("<tgt> <ref-k> <ref+k>" per line) over one
    raw KITTI drive directory.

    Pairs with `--velo-gt` evaluation (docs/PARITY_RUNBOOK.md §4): sparse
    GT is rasterized from the drive's velodyne scans at load time, so any
    raw drive yields eval metrics without data_depth_annotated.
    """
    image_dir = os.path.join(drive_dir, camera, "data")
    frames = sorted(
        int(os.path.splitext(os.path.basename(p))[0])
        for p in glob.glob(os.path.join(image_dir, "*.png"))
    )
    have = set(frames)
    lines: List[str] = []
    for frame in frames:
        if frame - ref_offset in have and frame + ref_offset in have:
            lines.append(
                f"{_frame_path(image_dir, frame)} "
                f"{_frame_path(image_dir, frame - ref_offset)} "
                f"{_frame_path(image_dir, frame + ref_offset)}"
            )
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with open(output_path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return lines
