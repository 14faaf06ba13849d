"""Synthetic stereo data: textured pairs with exact known disparity.

Used for overfit/regression tests and the multi-chip dry run — no dataset
download needed. The right view is the left view shifted by a constant
per-sample disparity (``left[w] == right[w - d]``), so a correct model can
drive EPE to ~0.
"""

from __future__ import annotations

import numpy as np

from esmstereo_tpu.data.io import normalize_image


def _smooth_noise(rng: np.random.Generator, h: int, w: int, c: int,
                  scale: int = 8) -> np.ndarray:
    """Random texture with spatial structure (bilinear-upsampled noise)."""
    small = rng.random((h // scale + 2, w // scale + 2, c)).astype(np.float32)
    ys = np.linspace(0, small.shape[0] - 1.001, h)
    xs = np.linspace(0, small.shape[1] - 1.001, w)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    a = small[y0][:, x0]
    b = small[y0][:, x0 + 1]
    c_ = small[y0 + 1][:, x0]
    d = small[y0 + 1][:, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c_ * fy * (1 - fx) + d * fy * fx)


def make_batch(rng: np.random.Generator, batch: int, h: int, w: int,
               max_disp: int = 192, disp_range: tuple[int, int] = (4, 20),
               pyramid: bool = True) -> dict:
    """Build a training batch dict (NHWC, ImageNet-normalised)."""
    lefts, rights, disps = [], [], []
    for _ in range(batch):
        d = int(rng.integers(disp_range[0], disp_range[1]))
        # generate a wide canvas and cut shifted views from it
        canvas = _smooth_noise(rng, h, w + d, 3)
        canvas += 0.1 * rng.standard_normal(canvas.shape).astype(np.float32)
        canvas = np.clip(canvas, 0, 1)
        left = canvas[:, d:]
        right = canvas[:, :w]
        lefts.append(normalize_image(left))
        rights.append(normalize_image(right))
        disps.append(np.full((h, w), float(d), dtype=np.float32))
    out = {
        "left": np.stack(lefts),
        "right": np.stack(rights),
        "disparity": np.stack(disps),
    }
    if pyramid:
        out["disparity_low"] = [
            out["disparity"][:, ::r, ::r] for r in (2, 4, 8, 16)
        ]
    return out
