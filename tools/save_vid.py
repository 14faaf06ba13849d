"""KITTI-raw video demo: stacked image + JET disparity frames with FPS overlay.

TPU-native counterpart of ``/root/reference/save_vid.py``: runs a raw
stereo sequence, times each forward, and writes stacked PNG frames
(camera image on top, colormapped disparity below, FPS burned in).
"""

from __future__ import annotations

import argparse
import os

from common import add_model_args, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU video demo")
    add_model_args(p)
    p.add_argument("--datapath", required=True,
                   help="raw drive dir containing image_02/ and image_03/")
    p.add_argument("--loadckpt", default="")
    p.add_argument("--outdir", default="./video_frames")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import cv2
    import numpy as np
    from glob import glob

    from esmstereo_tpu.data import benchmark_loaders as bl
    from esmstereo_tpu.eval.runner import InferenceRunner, load_model_for_eval
    from esmstereo_tpu.utils.visualization import colorize_disparity

    model, variables = load_model_for_eval(build_config(args), args.loadckpt)
    run = InferenceRunner(model, variables)

    lefts = sorted(glob(os.path.join(args.datapath, "image_02", "data",
                                     "*.png")))
    if args.limit:
        lefts = lefts[: args.limit]
    assert lefts, f"no frames under {args.datapath}/image_02/data"
    os.makedirs(args.outdir, exist_ok=True)

    for i, lp in enumerate(lefts):
        rp = lp.replace("image_02", "image_03")
        left = bl.load_image_u8(lp)
        right = bl.load_image_u8(rp)
        pred, dt = run(left, right)
        fps = 1.0 / max(dt, 1e-9)

        disp_color = colorize_disparity(pred, args.maxdisp)
        stacked = np.vstack([left, disp_color])
        stacked = cv2.cvtColor(stacked, cv2.COLOR_RGB2BGR)
        cv2.putText(stacked, f"{fps:6.1f} FPS", (20, left.shape[0] + 40),
                    cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 255), 2)
        cv2.imwrite(os.path.join(args.outdir, f"{i:06d}.png"), stacked)
        print(f"[{i + 1}/{len(lefts)}] {fps:.1f} fps")

    print(f"wrote {len(lefts)} frames to {args.outdir}")


if __name__ == "__main__":
    main()
