"""Native confidence serving, end to end: 2-output engine on the TPU.

The reference's confidence node deserializes a 4-tensor TensorRT engine,
reads disparity AND confidence, and masks validity by range AND
conf >= threshold with a live threshold control
(``kitti_publisher_conf_cuda_node.cpp:354,463-490,571-575``). This drives
the TPU-native counterpart through real hardware:

  1. export the confidence variant as StableHLO
     (``export_stablehlo.py --confidence``) at the deployment shape;
  2. run the C++ ``stereo_infer`` against the PJRT tunnel plugin with
     ``--conf_out`` + ``--conf_threshold`` and an N-frame steady-state
     timing loop (``--frames``);
  3. golden BOTH outputs against the Python forward of the same export
     (disparity through the identical conf-masked postprocess; the
     confidence map through the x65535 quantisation);
  4. run the C++ ``stereo_eval --conf`` on the outputs against the
     synthetic pair's known constant disparity.

Writes ``CONF_E2E.json`` at the repo root. Budget ~6-10 min wall
(session claim + remote compile).

Usage: python tools/conf_e2e.py [--height 384 --width 1248]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.pjrt_e2e import axon_env, axon_plugin_options  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description="C++ confidence serving e2e")
    p.add_argument("--plugin", default="/opt/axon/libaxon_pjrt.so")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--conf_threshold", type=float, default=0.5)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--shift", type=int, default=4)
    p.add_argument("--workdir", default="/tmp/conf_e2e")
    p.add_argument("--infer_bin",
                   default=os.path.join(REPO, "serving/build/stereo_infer"))
    p.add_argument("--eval_bin",
                   default=os.path.join(REPO, "serving/build/stereo_eval"))
    p.add_argument("--out_json", default=os.path.join(REPO, "CONF_E2E.json"))
    p.add_argument("--loadckpt", default="",
                   help="orbax checkpoint dir of TRAINED confidence-"
                        "variant weights (accuracy_scoreboard.py "
                        "--variants C --save_ckpt): the top-7 softmax "
                        "then sits on real cost margins instead of "
                        "random-init near-ties, which is what makes the "
                        "deploy-shape confidence golden strict")
    p.add_argument("--scene_pair", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="probe with an in-distribution layered-scene stereo "
                        "pair (make_scene_batch geometry, exact GT) instead "
                        "of rolled iid noise. Defaults ON when --loadckpt "
                        "is given: a trained model's cost margins are only "
                        "sharp on data resembling what it learned; on iid "
                        "noise every pixel is a near-tie and compile-"
                        "pipeline rank flips dominate both outputs.")
    p.add_argument("--strict_conf", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="include the confidence-map bounds in ok. At the "
                        "full deployment shape on a RANDOM-INIT model the "
                        "x100-sharpened top-7 cost ranks flip between "
                        "XLA compile pipelines and decorrelate the conf "
                        "map (~3% median) while disparity stays sub-1/256 "
                        "px — the same artifact class round 3 isolated "
                        "for the L regression. The small-shape run "
                        "(CONF_E2E_SMALL.json) asserts conf correctness "
                        "strictly.")
    return p.parse_args()


def main() -> int:
    args = parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    # Keep the session's default TPU backend: the decisive golden is
    # C++-on-TPU vs jax-on-TPU (same hardware, same StableHLO). A CPU
    # reference of THIS model decorrelates broadly on random init (the
    # LAFNet head consumes the top-k initial disparity, which bin-flips
    # on near-flat random cost, and the learned sampling scale compounds
    # it) — cross-backend drift is a model-numerics property, not a
    # serving-stack property.
    import jax
    import cv2
    import jax.export
    import jax.numpy as jnp
    import numpy as np

    # 1) export the confidence variant (CPU trace; portable StableHLO)
    model_path = os.path.join(args.workdir, "StereoConf")
    export_cmd = [
        sys.executable, os.path.join(REPO, "tools/export_stablehlo.py"),
        "--cpu", "--confidence", "--cv_scale", "16",
        "--backbone", "mobilenetv2_100", "--cv", "norm_correlation",
        "--height", str(args.height), "--width", str(args.width),
        "--out", model_path]
    if args.loadckpt:
        export_cmd += ["--loadckpt", os.path.abspath(args.loadckpt)]
    subprocess.run(export_cmd, check=True, cwd=os.path.join(REPO, "tools"))

    # 2) synthetic probe pair with exact GT: either rolled iid noise
    # (constant disparity) or an in-distribution layered scene
    scene_pair = (bool(args.loadckpt) if args.scene_pair is None
                  else args.scene_pair)
    rng = np.random.default_rng(3)
    if scene_pair:
        from esmstereo_tpu.data.synthetic import make_scene_batch
        batch = make_scene_batch(rng, 1, args.height, args.width,
                                 disp_range=(8, 96), pyramid=False,
                                 return_raw=True)
        img = (batch["left_raw"][0] * 255).round().astype(np.uint8)
        right_img = (batch["right_raw"][0] * 255).round().astype(np.uint8)
        gt_disp = batch["disparity"][0].astype(np.float32)
    else:
        img = (rng.random((args.height, args.width, 3)) * 255).astype(
            np.uint8)
        right_img = np.roll(img, -args.shift, axis=1)
        gt_disp = np.full((args.height, args.width), float(args.shift),
                          np.float32)
    left_p = os.path.join(args.workdir, "l.png")
    right_p = os.path.join(args.workdir, "r.png")
    cv2.imwrite(left_p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(right_p, cv2.cvtColor(right_img, cv2.COLOR_RGB2BGR))

    # 3) C++ serving run: 2 outputs + steady-state loop
    out_png = os.path.join(args.workdir, "disp.png")
    conf_png = os.path.join(args.workdir, "conf.png")
    cmd = [args.infer_bin, "--model", model_path + ".stablehlo.mlir",
           "--plugin", args.plugin, "--left", left_p, "--right", right_p,
           "--out", out_png, "--conf_out", conf_png,
           "--conf_threshold", str(args.conf_threshold),
           "--frames", str(args.frames), "--warmup", str(args.warmup),
           "--height", str(args.height), "--width", str(args.width)]
    cmd += axon_plugin_options()
    t0 = time.time()
    proc = subprocess.run(cmd, env=axon_env(), capture_output=True,
                          text=True, timeout=2400)
    wall_s = time.time() - t0
    print(proc.stdout)
    if proc.returncode != 0:
        print(proc.stderr, file=sys.stderr)
        return 1
    timing = json.loads(proc.stdout.strip().splitlines()[-1])

    # 4) jax-on-TPU golden of BOTH outputs (same hardware as the C++
    # run; the serving stack must reproduce it). The CPU export is
    # platform-locked, so rebuild the IDENTICAL model in-process: the
    # threefry init with key(0) is backend-deterministic, and the Pallas
    # fast paths are disabled to match the plain graph the CPU trace
    # baked into the exported StableHLO.
    from esmstereo_tpu.models import ESMStereoConfig
    from esmstereo_tpu.models.confidence import ESMStereoConfidence

    cfg = ESMStereoConfig(cv_scale=16, backbone="mobilenetv2_100",
                          cost_volume="norm_correlation",
                          fuse_backbone_head=False, fuse_stems=False,
                          pallas_volume=False, fuse_agg_stem=False)
    model = ESMStereoConfidence(config=cfg)
    if args.loadckpt:
        from esmstereo_tpu.train.checkpoints import restore_variables
        tree = restore_variables(os.path.abspath(args.loadckpt))
        variables = {"params": tree["params"],
                     "batch_stats": tree["batch_stats"]}
    else:
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(
            lambda l, r: model.init(jax.random.key(0), l, r, train=False)
        )(dummy, dummy)

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def prep(im):
        return ((im.astype(np.float32) / 255.0 - mean) / std)[None]

    fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))
    disp_py, conf_py = fwd(variables,
                           jax.device_put(jnp.asarray(prep(img))),
                           jax.device_put(jnp.asarray(prep(right_img))))
    disp_py = np.asarray(disp_py).reshape(args.height, args.width)
    conf_py = np.asarray(conf_py).reshape(args.height, args.width)
    print(f"jax backend for the golden: {jax.default_backend()}",
          flush=True)

    med = cv2.medianBlur(disp_py.astype(np.float32), 5)
    valid = (med > 0) & (med < 192) & (conf_py >= args.conf_threshold)
    expect_disp = (np.minimum(med * 256.0, 65535.0)).astype(np.uint16) * valid
    expect_conf = (np.clip(conf_py, 0, 1) * 65535.0).astype(np.uint16)

    got_disp = cv2.imread(out_png, cv2.IMREAD_UNCHANGED)
    got_conf = cv2.imread(conf_png, cv2.IMREAD_UNCHANGED)
    ddiff = np.abs(expect_disp.astype(np.int64) - got_disp.astype(np.int64))
    cdiff = np.abs(expect_conf.astype(np.int64) - got_conf.astype(np.int64))
    # mask flips: pixels where TPU-vs-CPU fp32 moves conf across the
    # threshold zero one side only — excluded from the bulk disparity
    # bound. On a RANDOM-INIT model the confidence clusters exactly at
    # sigmoid(~0) = tau = 0.5 (and the head consumes the top-k initial
    # disparity, which bin-flips on near-flat random cost), so raw flip
    # counts are meaningless: only flips where the Python conf is a
    # clear MARGIN away from tau indicate a serving-stack bug.
    flip = (got_disp == 0) != (expect_disp == 0)
    clear = np.abs(conf_py - args.conf_threshold) > 0.05
    flip_clear = float((flip & clear).sum() / max(clear.sum(), 1))
    conf_med = float(np.median(cdiff)) / 65535.0

    # 5) conf-thresholded eval vs the probe pair's exact GT
    gt_png = os.path.join(args.workdir, "gt.png")
    gt = np.minimum(gt_disp * 256.0, 65535.0).astype(np.uint16)
    cv2.imwrite(gt_png, gt)
    eval_out = subprocess.run(
        [args.eval_bin, "--est", out_png, "--gt", gt_png,
         "--conf", conf_png, "--conf_threshold", str(args.conf_threshold)],
        check=True, capture_output=True, text=True).stdout
    print(eval_out)

    # with TRAINED weights the conf map must be strictly reproducible at
    # the deploy shape (the random-init rank-flip artifact class is
    # gone): tighten the median bound to 1e-3 (round-5 criterion).
    conf_bound = 1e-3 if args.loadckpt else 0.02
    result = {
        "ok": bool(ddiff[~flip].mean() <= 64
                   and (ddiff[~flip] > 256).mean() <= 0.02
                   and (not args.strict_conf
                        or (flip_clear <= 0.05
                            and conf_med <= conf_bound))),
        "strict_conf": args.strict_conf,
        "conf_median_bound": conf_bound,
        "loadckpt": args.loadckpt,
        "scene_pair": scene_pair,
        "plugin": args.plugin,
        "golden_backend": "tpu-jax (same chip as the C++ run)",
        "model_shape": [args.height, args.width],
        "conf_threshold": args.conf_threshold,
        "disp_uint16_mean_diff": float(ddiff[~flip].mean()),
        "disp_frac_over_1px": float((ddiff[~flip] > 256).mean()),
        "mask_flip_frac_raw": float(flip.mean()),
        "mask_flip_frac_clear_margin": flip_clear,
        "conf_clear_margin_frac": float(clear.mean()),
        "conf_median_diff": conf_med,
        "conf_uint16_mean_diff": float(cdiff.mean()),
        "conf_uint16_max_diff": int(cdiff.max()),
        "masked_pixels_frac": float((got_disp == 0).mean()),
        "timing": timing,
        "eval_conf_stdout": eval_out.strip().splitlines(),
        "wall_seconds": round(wall_s, 1),
    }
    with open(args.out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
