"""Generate dataset list files (the counterpart of the reference's vendored
``filenames/*.txt``) by scanning a dataset root.

The reference ships static lists (``/root/reference/filenames/``); this tool
regenerates equivalent ones from the on-disk datasets so the framework has
no baked-in data manifests:

  * sceneflow: scans ``frames_finalpass/{TRAIN,TEST}`` + ``disparity``
  * kitti15 / kitti12: scans ``training/`` image pairs + GT, with a
    deterministic train/val split (first 160 / rest, like
    ``KITTI2015loader.py:38-40``)
  * kitti_raw: scans a raw drive's ``image_02/image_03``
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sceneflow(root: str, split: str) -> list[str]:
    lines = []
    pattern = os.path.join(root, "frames_finalpass", split.upper(),
                           "*", "*", "left", "*.png")
    for left in sorted(glob(pattern)):
        right = left.replace("/left/", "/right/")
        rel = os.path.relpath(left, root)
        disp = rel.replace("frames_finalpass", "disparity").replace(
            ".png", ".pfm")
        if os.path.exists(right) and os.path.exists(os.path.join(root, disp)):
            lines.append(f"{rel} {os.path.relpath(right, root)} {disp}")
    return lines


def kitti(root: str, year: int) -> list[str]:
    img_l = "image_2" if year == 2015 else "colored_0"
    img_r = "image_3" if year == 2015 else "colored_1"
    disp = "disp_occ_0" if year == 2015 else "disp_occ"
    lines = []
    for left in sorted(glob(os.path.join(root, "training", img_l, "*_10.png"))):
        rel = os.path.relpath(left, root)
        lines.append(" ".join([
            rel, rel.replace(img_l, img_r), rel.replace(img_l, disp)]))
    return lines


def kitti_raw(root: str) -> list[str]:
    lines = []
    for left in sorted(glob(os.path.join(root, "image_02", "data", "*.png"))):
        rel = os.path.relpath(left, root)
        lines.append(f"{rel} {rel.replace('image_02', 'image_03')}")
    return lines


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["sceneflow_train", "sceneflow_test",
                                    "kitti15", "kitti12", "kitti_raw"])
    p.add_argument("root")
    p.add_argument("-o", "--out", default="-")
    p.add_argument("--val_split", type=int, default=160,
                   help="KITTI train/val boundary")
    args = p.parse_args()

    if args.kind == "sceneflow_train":
        lines = sceneflow(args.root, "train")
    elif args.kind == "sceneflow_test":
        lines = sceneflow(args.root, "test")
    elif args.kind == "kitti15":
        lines = kitti(args.root, 2015)
    elif args.kind == "kitti12":
        lines = kitti(args.root, 2012)
    else:
        lines = kitti_raw(args.root)

    text = "\n".join(lines) + "\n"
    if args.out == "-":
        sys.stdout.write(text)
    else:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {len(lines)} entries to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
