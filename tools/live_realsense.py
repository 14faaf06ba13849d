"""Live stereo depth from an Intel RealSense D435i (dual IR streams).

TPU-native counterpart of ``/root/reference/latest.py``: configures the two
infrared streams at 1280x720@30, reads fx/baseline from the device
calibration, runs the stereo model per frame, converts disparity to metric
depth (``depth = fx * baseline / disparity``, clipped to ``--max_depth``),
and displays an annotated depth map.

Requires ``pyrealsense2`` (not bundled in this image — the import is gated
so the rest of the framework never depends on it).
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    try:
        import pyrealsense2 as rs
    except ImportError:
        print("pyrealsense2 is not installed; this tool needs a RealSense "
              "SDK environment (see latest.py in the reference).",
              file=sys.stderr)
        return 2
    import cv2

    from esmstereo_tpu.eval.runner import InferenceRunner, load_model_for_eval

    model, variables = load_model_for_eval(build_config(args), args.loadckpt)
    run = InferenceRunner(model, variables)

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

    try:
        while True:
            frames = pipeline.wait_for_frames()
            irl = np.asanyarray(frames.get_infrared_frame(1).get_data())
            irr = np.asanyarray(frames.get_infrared_frame(2).get_data())
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
            centre = depth[depth.shape[0] // 2, depth.shape[1] // 2]
            cv2.putText(vis, f"{1 / dt:5.1f} FPS  centre {centre:.2f} m",
                        (20, 40), cv2.FONT_HERSHEY_SIMPLEX, 1.0,
                        (255, 255, 255), 2)
            cv2.imshow("ESMStereo-TPU depth", vis)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    finally:
        pipeline.stop()
        cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())
