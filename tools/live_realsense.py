"""Live stereo depth from an Intel RealSense D435i (dual IR streams).

TPU-native counterpart of ``/root/reference/latest.py``: configures the two
infrared streams at 1280x720@30, reads fx/baseline from the device
calibration, runs the stereo model per frame, converts disparity to metric
depth (``depth = fx * baseline / disparity``, clipped to ``--max_depth``),
and displays an annotated depth map.

Requires ``pyrealsense2`` (not bundled in this image — the import is gated
so the rest of the framework never depends on it). ``--synthetic N``
drives the IDENTICAL frame loop (depth conversion, colormap, annotation,
display/record) from a generated constant-disparity IR pair instead of
the SDK, so the tool's logic is executable — and is executed, in
tests/test_tools_cli.py — without a camera.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from common import add_model_args, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU RealSense live")
    add_model_args(p)
    p.add_argument("--loadckpt", default="")
    p.add_argument("--stream_width", type=int, default=1280)
    p.add_argument("--stream_height", type=int, default=720)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--max_depth", type=float, default=10.0,
                   help="metres; depth clip (latest.py:54-58)")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="run N generated constant-disparity frames "
                        "through the full loop instead of a camera; "
                        "frames are written to --outdir, no display")
    p.add_argument("--outdir", default="",
                   help="with --synthetic: directory for annotated "
                        "depth-map frames")
    p.add_argument("--shift", type=int, default=8,
                   help="synthetic mode: ground-truth disparity in px")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


class _SyntheticCamera:
    """Stand-in for the RealSense pipeline: shifted-texture IR pairs with
    a known constant disparity and D435i-like calibration."""

    fx = 636.0          # D435i IR intrinsics ballpark at 1280x720
    baseline = 0.0499   # 5 cm stereo baseline (D435 series)

    def __init__(self, h: int, w: int, n: int, shift: int):
        rng = np.random.default_rng(7)
        base = (rng.random((h, w + shift)) * 255).astype(np.uint8)
        self._left = base[:, shift:]
        self._right = base[:, :w]
        self._n = n

    def frames(self):
        for _ in range(self._n):
            yield self._left, self._right


def frame_loop(camera_frames, run, fx, baseline, args, *,
               display: bool, outdir: str = "") -> float:
    """The per-frame pipeline shared by camera and synthetic modes.

    Returns the centre-pixel depth of the last frame (metres).
    """
    import cv2

    centre = float("nan")
    for i, (irl, irr) in enumerate(camera_frames):
        left = np.repeat(irl[..., None], 3, axis=-1)
        right = np.repeat(irr[..., None], 3, axis=-1)

        t0 = time.perf_counter()
        disp, _ = run(left, right)
        dt = time.perf_counter() - t0

        with np.errstate(divide="ignore"):
            depth = fx * baseline / np.maximum(disp, 1e-6)
        depth = np.clip(depth, 0.0, args.max_depth)

        vis = cv2.applyColorMap(
            (depth / args.max_depth * 255).astype(np.uint8),
            cv2.COLORMAP_JET)
        centre = float(depth[depth.shape[0] // 2, depth.shape[1] // 2])
        cv2.putText(vis, f"{1 / dt:5.1f} FPS  centre {centre:.2f} m",
                    (20, 40), cv2.FONT_HERSHEY_SIMPLEX, 1.0,
                    (255, 255, 255), 2)
        if outdir:
            cv2.imwrite(os.path.join(outdir, f"{i:06d}.png"), vis)
            print(f"[{i}] centre {centre:.3f} m  {1 / dt:.1f} fps",
                  flush=True)
        if display:
            cv2.imshow("ESMStereo-TPU depth", vis)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    return centre


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from esmstereo_tpu.eval.runner import InferenceRunner, load_model_for_eval

    model, variables = load_model_for_eval(build_config(args), args.loadckpt)
    run = InferenceRunner(model, variables)

    if args.synthetic:
        if args.outdir:
            os.makedirs(args.outdir, exist_ok=True)
        cam = _SyntheticCamera(args.stream_height, args.stream_width,
                               args.synthetic, args.shift)
        centre = frame_loop(cam.frames(), run, cam.fx, cam.baseline, args,
                            display=False, outdir=args.outdir)
        expected = cam.fx * cam.baseline / max(args.shift, 1e-6)
        print(f"synthetic done: centre {centre:.3f} m "
              f"(expected ~{min(expected, args.max_depth):.3f} m "
              f"for {args.shift} px)", flush=True)
        return 0

    try:
        import pyrealsense2 as rs
    except ImportError:
        print("pyrealsense2 is not installed; this tool needs a RealSense "
              "SDK environment (see latest.py in the reference).",
              file=sys.stderr)
        return 2
    import cv2

    pipeline = rs.pipeline()
    config = rs.config()
    config.enable_stream(rs.stream.infrared, 1, args.stream_width,
                         args.stream_height, rs.format.y8, args.fps)
    config.enable_stream(rs.stream.infrared, 2, args.stream_width,
                         args.stream_height, rs.format.y8, args.fps)
    profile = pipeline.start(config)

    # fx from intrinsics, baseline from the IR1->IR2 extrinsics
    ir1 = profile.get_stream(rs.stream.infrared, 1)
    ir2 = profile.get_stream(rs.stream.infrared, 2)
    intr = ir1.as_video_stream_profile().get_intrinsics()
    extr = ir1.get_extrinsics_to(ir2)
    fx = intr.fx
    baseline = abs(extr.translation[0])
    print(f"fx={fx:.2f} baseline={baseline * 100:.2f}cm")

    def camera_frames():
        while True:
            frames = pipeline.wait_for_frames()
            yield (np.asanyarray(frames.get_infrared_frame(1).get_data()),
                   np.asanyarray(frames.get_infrared_frame(2).get_data()))

    try:
        frame_loop(camera_frames(), run, fx, baseline, args, display=True)
    finally:
        pipeline.stop()
        cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())
