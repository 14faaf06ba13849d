"""KITTI 2012/2015 train-split evaluator.

TPU-native counterpart of ``/root/reference/test_kitti.py``: runs the full
200-image train split (160 train + 40 val partitions concatenated), pads
each image top-left to the next /32 multiple, reports EPE and >3px rate,
and optionally writes colormapped disparity/GT/error-map PNGs.
"""

from __future__ import annotations

import argparse
import os

from common import add_model_args, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU KITTI evaluation")
    add_model_args(p)
    p.add_argument("--datapath", required=True,
                   help="KITTI training root (with image_2/ or colored_0/)")
    p.add_argument("--kitti", default="2015", choices=["2015", "2012"])
    p.add_argument("--loadckpt", default="")
    p.add_argument("--save_dir", default="",
                   help="write error/gt/disp PNGs here (empty: skip)")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from esmstereo_tpu.data import benchmark_loaders as bl
    from esmstereo_tpu.eval.runner import (
        InferenceRunner,
        load_model_for_eval,
        masked_epe_and_rate,
    )
    from esmstereo_tpu.utils.visualization import colorize_disparity, error_map

    model, variables = load_model_for_eval(build_config(args), args.loadckpt)
    run = InferenceRunner(model, variables)

    if args.kitti == "2015":
        train, val = bl.kitti_2015_paths(args.datapath)
    else:
        train, val = bl.kitti_2012_paths(args.datapath)
    triples = train + val
    if args.limit:
        triples = triples[: args.limit]
    assert triples, f"no images found under {args.datapath}"

    if args.save_dir:
        for sub in ("error", "gt", "disp"):
            os.makedirs(os.path.join(args.save_dir, sub), exist_ok=True)

    total_epe, total_rate, total_time = 0.0, 0.0, 0.0
    for i, (lp, rp, dp) in enumerate(triples):
        left = bl.load_image_u8(lp)
        right = bl.load_image_u8(rp)
        gt = bl.load_kitti_disp(dp)
        pred, dt = run(left, right)
        total_time += dt

        mask = (gt > 0) & (gt < args.maxdisp)
        epe, rate = masked_epe_and_rate(pred, gt, mask, 3.0)
        total_epe += epe
        total_rate += rate
        print(f"[{i + 1}/{len(triples)}] {os.path.basename(lp)} "
              f"EPE {epe:.3f}  >3px {rate:.4f}  {dt * 1e3:.1f}ms")

        if args.save_dir:
            import cv2
            name = os.path.basename(lp)
            err_img = (error_map(pred, gt) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(args.save_dir, "error", name),
                        err_img[..., ::-1])
            cv2.imwrite(os.path.join(args.save_dir, "disp", name),
                        colorize_disparity(pred, args.maxdisp)[..., ::-1])
            cv2.imwrite(os.path.join(args.save_dir, "gt", name),
                        colorize_disparity(gt, args.maxdisp)[..., ::-1])

    n = len(triples)
    print("#### EPE", total_epe / n)
    print("#### >3.0", total_rate / n)
    print(f"#### mean forward {total_time / n * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
