"""Golden tests: native deployment visualization (viz_tool / stereo_viz)
vs Python renderers built from the same cv2 primitives.

Round-5 coverage of the reference's in-node display path
(``/root/reference/kitti_publisher/src/kitti_publisher_cuda_node.cpp:53-133``
``visualize_and_record_disparity``): MAGMA over the valid mask, center
metric depth, HZ/FPS overlays, stacked frames, MJPG recording.

The C++ side links system OpenCV 4.x while Python ships its own cv2
wheel, so font rasterization may differ by a few pixels between the two;
the colormapped regions must match byte-exactly and the overall frame to
>= 99 %.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

SERVING = os.path.join(os.path.dirname(__file__), "..", "serving")
BUILD = os.path.join(SERVING, "build")
TOOL = os.path.join(BUILD, "viz_tool")

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def viz_tool():
    if not os.path.exists(TOOL):
        if shutil.which("cmake") is None:
            pytest.skip("cmake unavailable")
        subprocess.run(["cmake", "-B", BUILD, "."], cwd=SERVING, check=True,
                       capture_output=True)
        subprocess.run(["cmake", "--build", BUILD], cwd=SERVING, check=True,
                       capture_output=True)
    if not os.path.exists(TOOL):
        pytest.skip("viz_tool not built (OpenCV dev libs unavailable)")
    return TOOL


def _scene(rng, h=96, w=160):
    left = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    disp = (20.0 + 15.0 * np.sin(xx / 17.0) * np.cos(yy / 11.0)).astype(
        np.float32)
    disp[:, :6] = 0.0       # invalid band exercises the masks
    return left, disp


def _compare(got, want, text_boxes, text_color):
    """Byte-exact outside the text/marker boxes; inside them the glyph
    rasterization differs between the system OpenCV (C++) and the cv2
    wheel, so only require that BOTH renderings actually drew text of the
    expected color there."""
    assert got.shape == want.shape, (got.shape, want.shape)
    mask = np.ones(got.shape[:2], bool)
    for (y0, y1, x0, x1) in text_boxes:
        mask[y0:y1, x0:x1] = False
    np.testing.assert_array_equal(got[mask], want[mask])
    tc = np.asarray(text_color, np.uint8)
    for img in (got, want):
        boxed = np.concatenate(
            [img[y0:y1, x0:x1].reshape(-1, 3)
             for (y0, y1, x0, x1) in text_boxes])
        assert (boxed == tc).all(axis=-1).sum() > 50, "text not drawn"


def test_stacked_matches_save_vid_renderer(viz_tool, tmp_path, rng):
    """viz_tool stacked == the tools/save_vid.py frame pipeline."""
    h, w = 96, 160
    left, disp = _scene(rng, h, w)
    max_disp, fps = 64.0, 71.3
    (tmp_path / "left.bin").write_bytes(left.tobytes())
    (tmp_path / "disp.bin").write_bytes(disp.tobytes())
    out = tmp_path / "frame.png"
    subprocess.run([viz_tool, "stacked", str(tmp_path / "left.bin"),
                    str(h), str(w), str(tmp_path / "disp.bin"),
                    str(max_disp), str(fps), str(out)], check=True)
    got = cv2.imread(str(out), cv2.IMREAD_COLOR)

    # Python twin (exactly tools/save_vid.py's math, BGR in-memory)
    norm = np.clip(disp / max_disp * 255.0, 0, 255).astype(np.uint8)
    disp_color = cv2.applyColorMap(norm, cv2.COLORMAP_JET)
    want = np.vstack([left, disp_color])
    cv2.putText(want, f"{fps:6.1f} FPS", (20, h + 40),
                cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 255), 2)

    _compare(got, want, [(h, h + 50, 0, 220)], (255, 255, 255))


def test_overlay_matches_reference_semantics(viz_tool, tmp_path, rng):
    """viz_tool overlay == a Python port of the reference
    visualize_and_record_disparity (MAGMA/valid-mask normalization,
    center depth fx*B/d, HZ overlay)."""
    h, w = 96, 160
    left, disp = _scene(rng, h, w)
    max_disp, fx, baseline, ms = 64.0, 707.0912, 0.536, 13.9
    (tmp_path / "left.bin").write_bytes(left.tobytes())
    (tmp_path / "disp.bin").write_bytes(disp.tobytes())
    out = tmp_path / "frame.png"
    subprocess.run([viz_tool, "overlay", str(tmp_path / "left.bin"),
                    str(h), str(w), str(tmp_path / "disp.bin"),
                    str(max_disp), str(fx), str(baseline), str(ms),
                    str(out)], check=True)
    got = cv2.imread(str(out), cv2.IMREAD_COLOR)

    valid = ((disp > 0) & (disp < max_disp)).astype(np.uint8) * 255
    masked = np.where(valid > 0, disp, 0.0).astype(np.float32)
    # convertTo(CV_16U, 256.0) rounds (cvRound), it does not truncate
    disp16 = np.clip(np.rint(masked.astype(np.float64) * 256.0), 0,
                     65535).astype(np.uint16)
    mn, mx, _, _ = cv2.minMaxLoc(disp16, valid)
    # convertTo(CV_8U, alpha, beta) == rint + saturate (cvRound is
    # round-half-to-even, np.rint's exact behavior)
    norm = np.clip(np.rint(disp16.astype(np.float64)
                           * (-255.0 / (mx - mn))
                           + 255.0 * mx / (mx - mn)), 0, 255).astype(
        np.uint8)
    disp_color = cv2.applyColorMap(norm, cv2.COLORMAP_MAGMA)
    cx, cy = w // 2, h // 2
    depth = fx * baseline / masked[cy, cx]
    cv2.circle(disp_color, (cx, cy), 5, (255, 0, 0), -1)
    cv2.putText(disp_color, f"{depth:.2f} m", (cx + 10, cy - 10),
                cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 0, 0), 2)
    text = f"{1000.0 / ms:.2f} HZ"
    (tw_, th_), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 1.0, 4)
    cv2.putText(disp_color, text, (w - tw_ - 10, th_ + 10),
                cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 4)
    want = np.vstack([left, disp_color])

    # text/marker boxes: center depth annotation (blue) + top-right HZ
    # label (green) — validate each with its own color
    depth_box = [(h + cy - 45, h + cy + 15, cx - 10, w)]
    # full-width band: getTextSize metrics differ across OpenCV versions,
    # which shifts the right-aligned origin itself
    hz_box = [(h, h + 60, 0, w)]
    _compare(got, want, depth_box + hz_box, (255, 0, 0))
    tc = np.asarray((0, 255, 0), np.uint8)
    y0, y1, x0, x1 = hz_box[0]
    for img in (got, want):
        assert (img[y0:y1, x0:x1] == tc).all(axis=-1).sum() > 50, \
            "HZ text not drawn"


def test_overlay_records_mjpg(viz_tool, tmp_path, rng):
    h, w = 96, 160
    left, disp = _scene(rng, h, w)
    (tmp_path / "left.bin").write_bytes(left.tobytes())
    (tmp_path / "disp.bin").write_bytes(disp.tobytes())
    avi = tmp_path / "rec.avi"
    subprocess.run([viz_tool, "overlay", str(tmp_path / "left.bin"),
                    str(h), str(w), str(tmp_path / "disp.bin"),
                    "64", "707.0912", "0.536", "13.9",
                    str(tmp_path / "frame.png"), str(avi)], check=True)
    assert avi.exists() and avi.stat().st_size > 1000
    cap = cv2.VideoCapture(str(avi))
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (2 * h, w, 3)
