"""Resampling ops: resize, pixel shuffle, patch extraction, grid sampling.

These reproduce the exact index semantics of the torch/cv2 ops the reference
relies on (``F.interpolate``, ``F.unfold``, ``F.grid_sample``,
``nn.PixelShuffle``), expressed as gathers/reshapes that XLA lowers well on
TPU. All image tensors are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Resizing
# ---------------------------------------------------------------------------

def resize_bilinear(x: Array, size: tuple[int, int]) -> Array:
    """Bilinear resize with half-pixel centers (= torch ``align_corners=False``).

    ``jax.image.resize(method='linear')`` uses half-pixel sampling, matching
    ``F.interpolate(mode='bilinear', align_corners=False)`` as used at e.g.
    ``ESMStereo.py:307,316``.
    """
    b, _, _, c = x.shape
    out = jax.image.resize(x, (b, size[0], size[1], c), method="linear")
    return out.astype(x.dtype)


def upsample2x_bilinear(x: Array) -> Array:
    """Scale-factor-2 bilinear upsample (align_corners=False)."""
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))


def resize_nearest(x: Array, size: tuple[int, int]) -> Array:
    """Nearest resize with source index ``floor(dst * src/dst)``.

    Matches torch's legacy ``mode='nearest'`` (used by ``Conv2x`` shape fixup,
    ``submodule.py:93-97``) and cv2 ``INTER_NEAREST`` (used for the GT
    disparity pyramid, ``sceneflow_dataset.py:119-121``) — both map
    ``dst -> floor(dst * scale)``, not half-pixel centers.
    """
    h_out, w_out = size
    h_in, w_in = x.shape[1], x.shape[2]
    rows = (jnp.arange(h_out) * h_in // h_out).astype(jnp.int32)
    cols = (jnp.arange(w_out) * w_in // w_out).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def pixel_shuffle(x: Array, r: int) -> Array:
    """Depth-to-space with torch ``nn.PixelShuffle`` channel ordering.

    Input ``(B, H, W, C*r*r)`` with channels laid out as ``(C, r, r)``
    (the layout a preceding conv trained against torch semantics produces);
    output ``(B, H*r, W*r, C)``.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, ri, w, rj, c
    return x.reshape(b, h * r, w * r, c)


# ---------------------------------------------------------------------------
# Patch extraction + context upsampling
# ---------------------------------------------------------------------------

def unfold3x3(x: Array) -> Array:
    """Extract 3x3 neighbourhoods with zero padding 1.

    Input ``(B, H, W, 1)``; output ``(B, H, W, 9)`` with taps ordered
    row-major ``(dy, dx) in (-1,0,1)^2`` — torch ``F.unfold(_, 3, 1, 1)``
    ordering for a single-channel input.
    """
    assert x.shape[-1] == 1, "unfold3x3 expects a single-channel image"
    padded = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))
    h, w = x.shape[1], x.shape[2]
    taps = [
        padded[:, dy:dy + h, dx:dx + w]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(taps, axis=-1)


def context_upsample(depth_low: Array, up_weights: Array, scale: int) -> Array:
    """Weighted combination of nearest-upsampled 3x3 neighbourhood taps.

    Reference semantics: ``submodule.py:202-209`` (scale 16, unused by the
    main net) and ``ESMStereo_confidence.py:534-543`` (scale 4). Each
    full-res pixel is a convex(ish) combination — per ``up_weights``, usually
    a softmax — of the 9 low-res neighbours of its parent pixel.

    Args:
      depth_low: ``(B, H, W, 1)``.
      up_weights: ``(B, H*scale, W*scale, 9)``.
      scale: integer upsampling factor.

    Returns:
      ``(B, H*scale, W*scale, 1)``.
    """
    taps = unfold3x3(depth_low)  # (B, H, W, 9)
    h, w = depth_low.shape[1], depth_low.shape[2]
    taps_up = resize_nearest(taps, (h * scale, w * scale))
    return jnp.sum(taps_up * up_weights, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Grid sampling / warping
# ---------------------------------------------------------------------------

def grid_sample_bilinear(x: Array, grid: Array, align_corners: bool) -> Array:
    """Bilinear sampling at normalised grid coords with zero padding.

    Equivalent of ``F.grid_sample(x, grid, mode='bilinear',
    padding_mode='zeros')``. ``x`` is NHWC ``(B, H, W, C)``; ``grid`` is
    ``(B, Ho, Wo, 2)`` with ``grid[..., 0] = gx`` (width coord) and
    ``grid[..., 1] = gy``, both in ``[-1, 1]``.
    """
    b, h, w, c = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        px = (gx + 1.0) * 0.5 * (w - 1)
        py = (gy + 1.0) * 0.5 * (h - 1)
    else:
        px = ((gx + 1.0) * w - 1.0) * 0.5
        py = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        idx = yi_c * w + xi_c  # (B, Ho, Wo)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(*idx.shape, c)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def warp(x: Array, disp: Array) -> Array:
    """Warp the right image/features to the left view via disparity.

    Reference semantics: ``submodule.py:227-243`` (grid_sample with default
    ``align_corners=False``): sample ``x`` at ``(w - disp, h)``.

    Args:
      x: ``(B, H, W, C)``.
      disp: ``(B, H, W, 1)`` positive disparity.
    """
    b, h, w, _ = x.shape
    xs = jnp.arange(w, dtype=x.dtype)[None, None, :]
    ys = jnp.arange(h, dtype=x.dtype)[None, :, None]
    px = xs - disp[..., 0]
    gx = 2.0 * px / max(w - 1, 1) - 1.0
    gy = jnp.broadcast_to(2.0 * ys / max(h - 1, 1) - 1.0, (b, h, w))
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample_bilinear(x, grid, align_corners=False)
