"""Two-engine A/B serving check: export two variants -> stereo_ab -> golden.

Executes the C++ ``stereo_ab`` harness (the TPU-native counterpart of the
reference's ESS comparison node,
``kitti_publisher_ess_cuda_node.cpp:139-165``: a second live network runs
over the same frames and both running EPE/D1 are reported) end to end on
the real TPU through the PJRT plugin: two StableHLO engines compiled into
one client, synthetic KITTI-style frames + uint16/256 GT, and the
harness's FINAL averages compared against Python forwards of the same
exported modules through the identical pre/post math.

Writes ``STEREO_AB.json`` at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pjrt_e2e import axon_env, axon_plugin_options  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--plugin", default="/opt/axon/libaxon_pjrt.so")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--workdir", default="/tmp/stereo_ab_e2e")
    p.add_argument("--ab_bin",
                   default=os.path.join(REPO, "serving/build/stereo_ab"))
    p.add_argument("--out_json", default=os.path.join(REPO, "STEREO_AB.json"))
    return p.parse_args()


def main() -> int:
    args = parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.export
    import jax.numpy as jnp
    import numpy as np

    # 1) export two distinct variants (CPU trace -> portable StableHLO)
    specs = {
        "A": ["--cv_scale", "16", "--backbone", "mobilenetv2_100",
              "--cv", "norm_correlation"],
        "B": ["--cv_scale", "4", "--backbone", "mobilenetv2_100",
              "--cv", "gwc"],
    }
    paths = {}
    for name, spec in specs.items():
        out = os.path.join(args.workdir, f"Stereo{name}")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/export_stablehlo.py"),
             "--cpu", *spec, "--height", str(args.height),
             "--width", str(args.width), "--out", out],
            check=True, cwd=os.path.join(REPO, "tools"))
        paths[name] = out

    # 2) synthetic frames: shifted texture + KITTI uint16/256 GT PNGs
    dirs = {d: os.path.join(args.workdir, d) for d in ("left", "right", "gt")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    frames = []
    for i in range(args.frames):
        d_true = int(rng.integers(3, 9))
        canvas = (rng.random((args.height, args.width + d_true, 3))
                  * 255).astype(np.uint8)
        left = canvas[:, d_true:]
        right = canvas[:, :args.width]
        gt = np.full((args.height, args.width), float(d_true), np.float32)
        cv2.imwrite(os.path.join(dirs["left"], f"{i:06d}.png"),
                    cv2.cvtColor(left, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(dirs["right"], f"{i:06d}.png"),
                    cv2.cvtColor(right, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(dirs["gt"], f"{i:06d}.png"),
                    (gt * 256).astype(np.uint16))
        frames.append((left, right, gt))

    # 3) run the two-engine harness on the TPU plugin
    cmd = [args.ab_bin,
           "--model_a", paths["A"] + ".stablehlo.mlir",
           "--model_b", paths["B"] + ".stablehlo.mlir",
           "--plugin", args.plugin,
           "--left_dir", dirs["left"], "--right_dir", dirs["right"],
           "--gt_dir", dirs["gt"],
           "--height", str(args.height), "--width", str(args.width),
           ] + axon_plugin_options()
    t0 = time.time()
    proc = subprocess.run(cmd, env=axon_env(), capture_output=True,
                          text=True, timeout=2400)
    wall_s = time.time() - t0
    print(proc.stdout)
    if proc.returncode != 0:
        print(proc.stderr, file=sys.stderr)
        return 1
    m = re.search(r"FINAL (\d+) frames \| A: EPE ([\d.]+) D1 ([\d.]+)% "
                  r"\| B: EPE ([\d.]+) D1 ([\d.]+)%", proc.stdout)
    assert m, proc.stdout
    cpp = {"frames": int(m.group(1)),
           "A": {"epe": float(m.group(2)), "d1": float(m.group(3)) / 100},
           "B": {"epe": float(m.group(4)), "d1": float(m.group(5)) / 100}}

    # 4) Python golden: same exported modules, same pre/post + metric math
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def prep(im):
        return ((im.astype(np.float32) / 255.0 - mean) / std)[None]

    def eval_disp(est, gt, max_disp=192.0):
        mask = (gt > 0) & (gt < max_disp)
        e = np.abs(est - gt)[mask]
        epe = float(e.mean())
        d1 = float(((e > 3.0) & (e / gt[mask] > 0.05)).mean())
        return epe, d1

    py = {}
    for name in specs:
        exported = jax.export.deserialize(
            open(paths[name] + ".jax_export.bin", "rb").read())
        epes, d1s = [], []
        for left, right, gt in frames:
            out = exported.call(jnp.asarray(prep(left)),
                                jnp.asarray(prep(right)))
            if isinstance(out, (tuple, list)):
                out = out[0]
            est = np.asarray(out).reshape(args.height, args.width)
            epe, d1 = eval_disp(est, gt)
            epes.append(epe)
            d1s.append(d1)
        py[name] = {"epe": float(np.mean(epes)), "d1": float(np.mean(d1s))}

    # TPU-executed engines vs CPU-evaluated exports: fp32 conv numerics
    # differ slightly and the top-k regression is discontinuous, so the
    # bound is relative on EPE (measured ~2.5e-4 rel) and absolute on D1.
    ok = cpp["frames"] == args.frames and all(
        abs(cpp[n]["epe"] - py[n]["epe"]) / max(py[n]["epe"], 1.0) < 2e-3
        and abs(cpp[n]["d1"] - py[n]["d1"]) < 5e-3 for n in specs)
    result = {
        "ok": bool(ok),
        "frames": cpp["frames"],
        "shape": [args.height, args.width],
        "cpp": {n: cpp[n] for n in specs},
        "python": py,
        "wall_seconds": round(wall_s, 1),
    }
    with open(args.out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
