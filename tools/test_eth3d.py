"""ETH3D two-view evaluator (bad-1.0 + EPE with mask0nocc occlusion masks).

TPU-native counterpart of ``/root/reference/test_eth3d.py:63-115``.
"""

from __future__ import annotations

import argparse
import os

from common import add_model_args, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU ETH3D eval")
    add_model_args(p)
    p.add_argument("--datapath", required=True)
    p.add_argument("--bad_thresh", type=float, default=1.0)
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

    scenes = bl.eth3d_paths(args.datapath)
    if args.limit:
        scenes = scenes[: args.limit]
    assert scenes, f"no scenes under {args.datapath}"

    bad_sum, epe_sum = 0.0, 0.0
    for lp, rp, gtp, maskp in scenes:
        left = bl.load_image_u8(lp)
        right = bl.load_image_u8(rp)
        gt = bl.load_pfm_disp(gtp)
        pred, dt = run(left, right)

        valid = (gt > 0) & (gt < args.maxdisp)
        if maskp:
            valid &= bl.load_nocc_mask(maskp)
        err = np.abs(pred - gt)
        bad = float(np.mean(err[valid] > args.bad_thresh))
        epe = float(np.mean(err[valid]))
        bad_sum += bad
        epe_sum += epe
        print(f"{os.path.dirname(lp).split('/')[-1]}: bad{args.bad_thresh} "
              f"{bad:.4f} EPE {epe:.3f}  {dt * 1e3:.1f}ms")

    n = len(scenes)
    print(f"Bad {args.bad_thresh}", bad_sum / n * 100)
    print("EPE", epe_sum / n)


if __name__ == "__main__":
    main()
