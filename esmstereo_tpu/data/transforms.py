"""Stereo-pair augmentations (numpy, host-side).

Reproduces the reference training augmentation set exactly
(``/root/reference/datasets/sceneflow_dataset.py:55-121``,
``kitti_dataset.py:71-132``, ``flow_transforms.py``):

  * asymmetric chromatic aug — brightness/gamma/contrast/saturation drawn
    independently per eye (torchvision-PIL formulas on uint8);
  * joint random crop of left/right/disparity;
  * right-eye random occlusion patch filled with the mean colour;
  * nearest-downsampled GT disparity pyramid at /2 /4 /8 /16 (values kept
    in full-resolution units);
  * RandomVdisp (right-image rotation + vertical shift) and cubic Scale —
    constructed-but-unused in the reference, kept as optional ops.

All functions take an explicit ``np.random.Generator`` for deterministic
per-host data sharding.
"""

from __future__ import annotations

import numpy as np

_GRAY = np.array([0.299, 0.587, 0.114], dtype=np.float64)


def _to_uint8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


# Performance note (the training loop is host-loader-bound; see
# BASELINE.md): brightness / gamma / contrast are PER-VALUE uint8->uint8
# maps, so each is applied as a 256-entry LUT gather — and sequential
# application quantizes to uint8 between steps, so pre-composing LUTs is
# BIT-exact, not an approximation. The torchvision goldens in
# tests/test_data.py pin every formula below.


def _lut_brightness(factor: float) -> np.ndarray:
    """PIL ImageEnhance.Brightness: blend with black."""
    return _to_uint8(np.arange(256, dtype=np.float64) * factor)


def _lut_gamma(gamma: float, gain: float = 1.0) -> np.ndarray:
    """torchvision adjust_gamma: 255 * gain * (img/255)**gamma."""
    return _to_uint8(
        255.0 * gain * (np.arange(256, dtype=np.float64) / 255.0) ** gamma)


def _lut_contrast(factor: float, mean: float) -> np.ndarray:
    return _to_uint8(
        (np.arange(256, dtype=np.float64) - mean) * factor + mean)


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Brightness: blend with black."""
    return _lut_brightness(factor)[img]


def adjust_gamma(img: np.ndarray, gamma: float, gain: float = 1.0) -> np.ndarray:
    """torchvision adjust_gamma: 255 * gain * (img/255)**gamma."""
    return _lut_gamma(gamma, gain)[img]


def _grayscale(img: np.ndarray) -> np.ndarray:
    """PIL 'L' conversion: floor of the weighted sum."""
    return (img.astype(np.float64) @ _GRAY).astype(np.uint8)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Contrast: blend with the mean of the grayscale image."""
    mean = round(_grayscale(img).mean() + 0.5)  # PIL uses int(mean + 0.5)
    return _lut_contrast(factor, mean)[img]


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Color: blend with the grayscale image.

    The blend is a function of the (value, gray) uint8 pair only, so it
    runs as one bit-exact 256x256 LUT gather instead of a float64
    per-pixel blend."""
    gray = _grayscale(img)
    v = np.arange(256, dtype=np.float64)
    lut2 = _to_uint8((v[None, :] - v[:, None]) * factor + v[:, None])
    return lut2[gray[..., None], img]


def asymmetric_chromatic_aug(rng: np.random.Generator, left: np.ndarray,
                             right: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-eye independent photometric jitter (``sceneflow_dataset.py:58-89``).

    brightness∘gamma is pre-composed into ONE LUT (bit-exact: both steps
    quantize to uint8), then contrast (whose blend mean is computed on the
    post-gamma image, as PIL does) composes in as a second gather; only
    the saturation blend needs per-pixel float math.
    """
    brightness = rng.uniform(0.5, 2.0, 2)
    gamma = rng.uniform(0.8, 1.2, 2)
    contrast = rng.uniform(0.8, 1.2, 2)
    saturation = rng.uniform(0.0, 1.4, 2)
    out = []
    for i, img in enumerate((left, right)):
        lut_bg = _lut_gamma(gamma[i])[_lut_brightness(brightness[i])]
        img = lut_bg[img]
        img = adjust_contrast(img, contrast[i])
        img = adjust_saturation(img, saturation[i])
        out.append(img)
    return out[0], out[1]


def random_crop(rng: np.random.Generator, left: np.ndarray, right: np.ndarray,
                disp: np.ndarray, size: tuple[int, int]):
    """Joint random crop (``flow_transforms.py:53-74``)."""
    h, w = left.shape[:2]
    th, tw = min(size[0], h), min(size[1], w)
    x1 = int(rng.integers(0, w - tw + 1))
    y1 = int(rng.integers(0, h - th + 1))
    return (left[y1:y1 + th, x1:x1 + tw],
            right[y1:y1 + th, x1:x1 + tw],
            disp[y1:y1 + th, x1:x1 + tw])


def random_occlusion_patch(rng: np.random.Generator, right: np.ndarray,
                           prob: float) -> np.ndarray:
    """Fill a random right-eye rectangle with the mean colour
    (``sceneflow_dataset.py:109-116``; prob 0.5 SceneFlow, 0.2 KITTI)."""
    if rng.binomial(1, prob):
        right = right.copy()
        sx = int(rng.uniform(35, 100))
        sy = int(rng.uniform(25, 75))
        # reference assumes >=200x150 crops; clamp so small images work too
        sx = min(sx, (right.shape[0] - 1) // 2)
        sy = min(sy, (right.shape[1] - 1) // 2)
        cx = int(rng.uniform(sx, right.shape[0] - sx))
        cy = int(rng.uniform(sy, right.shape[1] - sy))
        right[cx - sx:cx + sx, cy - sy:cy + sy] = np.mean(
            np.mean(right, 0), 0)[np.newaxis, np.newaxis]
    return right


def disparity_pyramid(disp: np.ndarray,
                      factors=(2, 4, 8, 16)) -> list[np.ndarray]:
    """Nearest-downsampled GT pyramid in full-res disparity units.

    cv2 INTER_NEAREST maps ``dst -> floor(dst * scale)``, which for integer
    factors is a plain strided slice (``sceneflow_dataset.py:119-121``).
    """
    return [np.ascontiguousarray(disp[::f, ::f]) for f in factors]


def random_vdisp(rng: np.random.Generator, right: np.ndarray, angle: float,
                 px: float) -> np.ndarray:
    """Right-image small rotation + vertical shift (``flow_transforms.py:77-103``).

    Constructed but never applied by the reference pipeline
    (``sceneflow_dataset.py:94-103``); provided as an optional op.
    """
    import cv2
    px2 = rng.uniform(-px, px)
    angle2 = rng.uniform(-angle, angle)
    center = (rng.uniform(0, right.shape[0]), rng.uniform(0, right.shape[1]))
    rot = cv2.getRotationMatrix2D(center, angle2, 1.0)
    right = cv2.warpAffine(right, rot, right.shape[1::-1],
                           flags=cv2.INTER_LINEAR)
    trans = np.float32([[1, 0, 0], [0, 1, px2]])
    return cv2.warpAffine(right, trans, right.shape[1::-1],
                          flags=cv2.INTER_LINEAR)


def scale_pair(left: np.ndarray, right: np.ndarray, disp: np.ndarray,
               ratio: float, order: int = 0):
    """Cubic image rescale + disparity rescale x ratio (``flow_transforms.py:22-50``)."""
    import cv2
    interp = {0: cv2.INTER_NEAREST, 1: cv2.INTER_LINEAR,
              2: cv2.INTER_CUBIC}[order]
    left = cv2.resize(left, None, fx=ratio, fy=ratio,
                      interpolation=cv2.INTER_CUBIC)
    right = cv2.resize(right, None, fx=ratio, fy=ratio,
                       interpolation=cv2.INTER_CUBIC)
    disp = cv2.resize(disp, None, fx=ratio, fy=ratio,
                      interpolation=interp) * ratio
    return left, right, disp
