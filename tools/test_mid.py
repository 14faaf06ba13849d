"""Middlebury training-scene evaluator (bad-2.0 + EPE, occlusion-masked).

TPU-native counterpart of ``/root/reference/test_mid.py:70-138``.
"""

from __future__ import annotations

import argparse
import os

from common import add_model_args, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU Middlebury eval")
    add_model_args(p)
    p.add_argument("--datapath", required=True,
                   help="root with per-scene dirs (im0/im1.png, disp0GT.pfm)")
    p.add_argument("--bad_thresh", type=float, default=2.0)
    p.add_argument("--loadckpt", default="")
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
    from esmstereo_tpu.eval.runner import InferenceRunner, load_model_for_eval

    model, variables = load_model_for_eval(build_config(args), args.loadckpt)
    run = InferenceRunner(model, variables)

    scenes = bl.middlebury_paths(args.datapath)
    if args.limit:
        scenes = scenes[: args.limit]
    assert scenes, f"no scenes under {args.datapath}"

    bad_sum, epe_sum = 0.0, 0.0
    for lp, rp, gtp, maskp in scenes:
        left = bl.load_image_u8(lp)
        right = bl.load_image_u8(rp)
        gt = bl.load_pfm_disp(gtp)
        pred, dt = run(left, right)

        h, w = gt.shape
        invalid = (gt <= 0) | (gt >= args.maxdisp)
        if maskp:
            invalid |= ~bl.load_nocc_mask(maskp)
        err = np.abs(pred - gt)
        err[invalid] = 0
        denom = max(h * w - int(invalid.sum()), 1)
        bad = float(np.sum(err > args.bad_thresh) / denom)
        epe = float(np.sum(err) / denom)
        bad_sum += bad
        epe_sum += epe
        print(f"Bad {os.path.dirname(lp).split('/')[-1]}: {bad:.4f} "
              f"EPE {epe:.3f}  {dt * 1e3:.1f}ms")

    n = len(scenes)
    print(f"Bad {args.bad_thresh}", bad_sum / n * 100)
    print("EPE", epe_sum / n)


if __name__ == "__main__":
    main()
