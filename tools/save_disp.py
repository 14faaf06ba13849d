"""KITTI benchmark submission writer.

TPU-native counterpart of ``/root/reference/save_disp.py``: runs the KITTI
test split (no GT), un-pads the predictions, and writes uint16
``disparity*256`` PNGs ready for leaderboard submission.
"""

from __future__ import annotations

import argparse
import os

from common import add_model_args, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU submission writer")
    add_model_args(p)
    p.add_argument("--datapath", required=True,
                   help="KITTI testing root (with image_2/ or colored_0/)")
    p.add_argument("--kitti", default="2015", choices=["2015", "2012"])
    p.add_argument("--loadckpt", default="")
    p.add_argument("--outdir", default="./predictions")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from glob import glob
    from PIL import Image

    from esmstereo_tpu.data import benchmark_loaders as bl
    from esmstereo_tpu.eval.runner import InferenceRunner, load_model_for_eval

    model, variables = load_model_for_eval(build_config(args), args.loadckpt)
    run = InferenceRunner(model, variables)

    img_l = "image_2" if args.kitti == "2015" else "colored_0"
    img_r = "image_3" if args.kitti == "2015" else "colored_1"
    lefts = sorted(glob(os.path.join(args.datapath, img_l, "*_10.png")))
    if args.limit:
        lefts = lefts[: args.limit]
    assert lefts, f"no images under {args.datapath}/{img_l}"
    os.makedirs(args.outdir, exist_ok=True)

    for i, lp in enumerate(lefts):
        rp = lp.replace(img_l, img_r)
        left = bl.load_image_u8(lp)
        right = bl.load_image_u8(rp)
        pred, dt = run(left, right)
        out = np.round(np.clip(pred, 0, 255) * 256).astype(np.uint16)
        name = os.path.basename(lp)
        Image.fromarray(out).save(os.path.join(args.outdir, name))
        print(f"[{i + 1}/{len(lefts)}] {name}  {dt * 1e3:.1f}ms")

    print(f"wrote {len(lefts)} predictions to {args.outdir}")


if __name__ == "__main__":
    main()
