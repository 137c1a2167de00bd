"""Split-file preparation entry point.

Capability parity with the reference's runnable script
/root/reference/prep_split_files.py (kitti_depth_annotated_prepare,
:18-55), plus the GT-less raw-drive variant that pairs with `--velo-gt`
evaluation (docs/PARITY_RUNBOOK.md).

Usage:
  # annotated-depth split (reference workflow)
  python -m unsupervised_pseuso_lidar_tpu.cli.splits annotated \
      --kitti /data/kitti_raw --depth /data/data_depth_annotated \
      --out splits/kitti_ext.txt [--split train] [--ref-offset 1]

  # GT-less split over one raw drive (evaluate with --velo-gt)
  python -m unsupervised_pseuso_lidar_tpu.cli.splits drive \
      --drive /data/kitti_raw/2011_09_26/2011_09_26_drive_0001_sync \
      --out splits/drive0001.txt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="KITTI split-file preparation")
    sub = parser.add_subparsers(dest="mode", required=True)

    ann = sub.add_parser(
        "annotated", help="pair raw frames with data_depth_annotated GT"
    )
    ann.add_argument("--kitti", required=True,
                     help="KITTI raw root (date dirs with drive_sync subdirs)")
    ann.add_argument("--depth", required=True,
                     help="data_depth_annotated root")
    ann.add_argument("--out", required=True, help="output split file")
    ann.add_argument("--split", default="train", choices=("train", "val"))
    ann.add_argument("--ref-offset", type=int, default=1,
                     help="temporal distance of the reference frames (the "
                     "reference script checked ±1 but wrote ±3, "
                     "prep_split_files.py:45-52 — here one value does both)")
    ann.add_argument("--camera", default="image_02")

    drv = sub.add_parser(
        "drive", help="GT-less split over one raw drive (use --velo-gt eval)"
    )
    drv.add_argument("--drive", required=True, help="raw drive directory")
    drv.add_argument("--out", required=True, help="output split file")
    drv.add_argument("--ref-offset", type=int, default=1)
    drv.add_argument("--camera", default="image_02")

    args = parser.parse_args(argv)

    from unsupervised_pseuso_lidar_tpu.data.splits import (
        kitti_depth_annotated_prepare,
        raw_drive_split,
    )

    if args.mode == "annotated":
        lines = kitti_depth_annotated_prepare(
            args.kitti, args.depth, args.out,
            split=args.split, ref_offset=args.ref_offset, camera=args.camera,
        )
    else:
        lines = raw_drive_split(
            args.drive, args.out,
            ref_offset=args.ref_offset, camera=args.camera,
        )
    print(f"wrote {len(lines)} lines to {args.out}")
    return lines


if __name__ == "__main__":
    main()
