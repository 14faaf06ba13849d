"""Disparity visualisation: KITTI-style error maps and colormapped disparity.

Reference semantics: ``/root/reference/utils/visualization.py`` (the
10-bucket KITTI devkit error colormap over ``min(err/3, rel_err/0.05)``,
with a legend strip) — output here is NHWC float in [0, 1].
"""

from __future__ import annotations

import numpy as np

# KITTI stereo devkit error-color buckets: (lo, hi) in units of the
# combined error ratio, and an RGB color.
_BUCKETS = np.array(
    [[0 / 3.0, 0.1875 / 3.0, 49, 54, 149],
     [0.1875 / 3.0, 0.375 / 3.0, 69, 117, 180],
     [0.375 / 3.0, 0.75 / 3.0, 116, 173, 209],
     [0.75 / 3.0, 1.5 / 3.0, 171, 217, 233],
     [1.5 / 3.0, 3 / 3.0, 224, 243, 248],
     [3 / 3.0, 6 / 3.0, 254, 224, 144],
     [6 / 3.0, 12 / 3.0, 253, 174, 97],
     [12 / 3.0, 24 / 3.0, 244, 109, 67],
     [24 / 3.0, 48 / 3.0, 215, 48, 39],
     [48 / 3.0, np.inf, 165, 0, 38]], dtype=np.float32)


def gen_error_colormap() -> np.ndarray:
    cols = _BUCKETS.copy()
    cols[:, 2:5] /= 255.0
    return cols


def error_map(d_est: np.ndarray, d_gt: np.ndarray, abs_thres: float = 3.0,
              rel_thres: float = 0.05, legend: bool = True) -> np.ndarray:
    """Colormapped error image(s), NHWC float32 in [0,1].

    Accepts ``(B, H, W)`` or ``(H, W)`` inputs.
    """
    squeeze = d_gt.ndim == 2
    if squeeze:
        d_est, d_gt = d_est[None], d_gt[None]
    b, h, w = d_gt.shape
    cols = gen_error_colormap()

    mask = d_gt > 0
    err = np.abs(d_gt - d_est)
    ratio = np.zeros_like(err)
    ratio[mask] = np.minimum(err[mask] / abs_thres,
                             (err[mask] / d_gt[mask]) / rel_thres)

    image = np.zeros((b, h, w, 3), dtype=np.float32)
    for lo, hi, *rgb in cols:
        image[(ratio >= lo) & (ratio < hi)] = rgb
    image[~mask] = 0.0

    if legend:
        distance = 20
        for i in range(len(cols)):
            image[:, :10, i * distance:(i + 1) * distance] = cols[i, 2:]
    return image[0] if squeeze else image


def colorize_disparity(disp: np.ndarray, max_disp: float | None = None
                       ) -> np.ndarray:
    """JET-style colormapped disparity (HWC uint8), as the demo writers use
    (``save_vid.py:120-127`` applies cv2 COLORMAP_JET)."""
    import cv2
    if max_disp is None:
        max_disp = max(float(disp.max()), 1.0)
    norm = np.clip(disp / max_disp * 255.0, 0, 255).astype(np.uint8)
    return cv2.applyColorMap(norm, cv2.COLORMAP_JET)[..., ::-1]  # BGR->RGB
