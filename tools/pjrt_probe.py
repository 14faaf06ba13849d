"""Serving-transport health probe: byte-exact PJRT round-trip check.

Compiles a trivial two-output StableHLO module at a given shape through
the C++ ``stereo_infer`` binary and checks the outputs byte-exactly:

  * output 0 ("disparity"): an input-independent column ramp — any
    deviation isolates device-to-host corruption (no model, no H2D);
  * output 1 ("confidence"): ``0.2 * right[...,0] + 0.5`` — checks the
    host-to-device upload of the right image through the full
    preprocess -> execute -> readback loop.

This is the probe that caught the round-5 serving regression: the
remote-compile service started choosing non-default (transposed) output
layouts, and ``PJRT_Buffer_ToHostBuffer`` with a null host layout copies
in the SOURCE layout — a silently-permuted map whose sorted values
matched the reference exactly. Run this first whenever a serving golden
deviates: if the probe fails, the transport is broken and no model-level
debugging is meaningful.

Usage: python tools/pjrt_probe.py [--height 384 --width 1248]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.pjrt_e2e import axon_env, axon_plugin_options  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--plugin", default="/opt/axon/libaxon_pjrt.so")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--workdir", default="/tmp/pjrt_probe")
    p.add_argument("--infer_bin",
                   default=os.path.join(REPO, "serving/build/stereo_infer"))
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.export
    import jax.numpy as jnp
    import numpy as np

    H, W = args.height, args.width

    def f(l, r):
        ramp = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.float32)[None, None, :] * 0.1 + 10.0,
            (1, H, W))
        return ramp + 0.0 * l[..., 0], r[..., 0] * 0.2 + 0.5

    shape = jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32)
    exported = jax.export.export(jax.jit(f))(shape, shape)
    model = os.path.join(args.workdir, "probe.mlir")
    with open(model, "w") as fh:
        fh.write(exported.mlir_module())

    rng = np.random.default_rng(7)
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    left_p = os.path.join(args.workdir, "l.png")
    right_p = os.path.join(args.workdir, "r.png")
    cv2.imwrite(left_p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(right_p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    out_p = os.path.join(args.workdir, "disp.png")
    conf_p = os.path.join(args.workdir, "conf.png")

    cmd = [args.infer_bin, "--model", model, "--plugin", args.plugin,
           "--left", left_p, "--right", right_p, "--out", out_p,
           "--conf_out", conf_p, "--height", str(H), "--width", str(W)]
    cmd += axon_plugin_options()
    proc = subprocess.run(cmd, env=axon_env(), capture_output=True,
                          text=True, timeout=1200)
    if proc.returncode != 0:
        print(proc.stdout, proc.stderr, file=sys.stderr)
        print(json.dumps({"ok": False, "stage": "stereo_infer"}))
        return 1

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    prep = (img.astype(np.float32) / 255.0 - mean) / std
    ramp = np.broadcast_to(
        np.arange(W, dtype=np.float32)[None, :] * 0.1 + 10.0, (H, W))
    exp_c = np.clip(prep[..., 0] * 0.2 + 0.5, 0, 1)
    med = cv2.medianBlur(ramp.astype(np.float32), 5)
    valid = (med > 0) & (med < 192) & (exp_c >= 0.5)
    expect_d = (np.minimum(med * 256, 65535)).astype(np.uint16) * valid
    got_d = cv2.imread(out_p, cv2.IMREAD_UNCHANGED)
    got_c = cv2.imread(conf_p, cv2.IMREAD_UNCHANGED).astype(np.float32) / 65535.0

    ddiff = np.abs(expect_d.astype(np.int64) - got_d.astype(np.int64))
    cdiff = np.abs(exp_c - got_c)
    result = {
        # disp must be BYTE-exact (input-independent ramp); conf within
        # uint16 quantization of the f32 math
        "ok": bool(int(ddiff.max()) == 0 and float(cdiff.max()) < 1e-4),
        "shape": [H, W],
        "d2h_ramp_uint16_max_diff": int(ddiff.max()),
        "h2d_conf_max_diff": float(cdiff.max()),
    }
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
