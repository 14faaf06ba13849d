"""Phase folding: run sub-grid resolutions as channel phases on a base grid.

The ESM upsampler does most of its small-channel conv work at 1/2 and full
resolution, where 16-32-channel convs underfill the TPU's 128-lane MXU and
every resolution change costs a layout copy. Phase folding keeps every
tensor on the coarse base grid and represents an ``s``-times-finer tensor
as ``s^2`` channel phases (space-to-depth), so

  * a conv at fine resolution becomes a conv on the base grid with a
    phase-mixing channel matrix (channels x phases -> MXU-friendly);
  * pixel-shuffle / transposed-conv upsampling becomes a pure channel op;
  * bilinear x2 upsampling becomes a constant 2x2-support conv.

``phase_fold_kernel`` is the single general transform: given torch-layout
conv weights ``(kh, kw, ci, co)`` operating between real resolutions with
``p_in`` / ``p_out`` phases per axis on the same base grid, it builds the
equivalent base-grid kernel and asymmetric padding. Modes:

  * ``conv``:   real stride ``s = p_in // p_out`` (>= 1)
  * ``deconv``: transposed conv, real stride 2, ``p_out = 2 * p_in``

Phase layout is row-major ``(py, px, c)`` (phase-major channels), matching
``to_phases``/``from_phases``. All transforms are exact; see
tests/test_phasefold.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def to_phases(x: Array, p: int) -> Array:
    """(B, p*H, p*W, C) -> (B, H, W, p*p*C), phases row-major (py, px, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p, p * p * c)


def from_phases(x: Array, p: int) -> Array:
    """(B, H, W, p*p*C) -> (B, p*H, p*W, C)."""
    b, h, w, pc = x.shape
    c = pc // (p * p)
    x = x.reshape(b, h, w, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * p, w * p, c)


def _placements_conv(k: int, pad: int, s: int, p_in: int, p_out: int):
    """1-D placements for a conv: yields (base_offset, phase_in, kh, q_out)."""
    out = []
    for q in range(p_out):
        for kh in range(k):
            t = s * q + kh - pad
            out.append((t // p_in, t % p_in, kh, q))
    return out


def _placements_deconv(k: int, pad: int, p_in: int, p_out: int):
    """1-D placements for a k,s=2 transposed conv (p_out = 2 * p_in)."""
    out = []
    for q in range(p_out):
        for kd in range(k):
            num = q + pad - kd
            if num % 2 != 0:
                continue
            t = num // 2
            out.append((t // p_in, t % p_in, kd, q))
    return out


def phase_fold_kernel(w, mode: str, pad: int, p_in: int, p_out: int):
    """Fold conv weights into the base-grid equivalent.

    Args:
      w: ``(kh, kw, ci, co)`` weights (torch semantics; for ``deconv`` the
        unflipped transposed-conv weights, stride 2, as stored by
        ``TorchConvTranspose``).
      mode: ``'conv'`` (real stride = p_in // p_out) or ``'deconv'``.
      pad: the original symmetric padding.
      p_in / p_out: phases per axis of input / output on the base grid.

    Returns:
      (w2, pads): base-grid kernel ``(KH, KW, p_in^2*ci, p_out^2*co)`` and
      asymmetric padding ``((lo_y, hi_y), (lo_x, hi_x))`` for a stride-1
      base-grid convolution.
    """
    w = np.asarray(w)
    kh, kw, ci, co = w.shape
    if mode == "conv":
        s = p_in // p_out
        assert s >= 1 and p_in == s * p_out, (p_in, p_out)
        ply = _placements_conv(kh, pad, s, p_in, p_out)
        plx = _placements_conv(kw, pad, s, p_in, p_out)
    else:
        assert p_out == 2 * p_in, (p_in, p_out)
        ply = _placements_deconv(kh, pad, p_in, p_out)
        plx = _placements_deconv(kw, pad, p_in, p_out)

    fy = [p[0] for p in ply]
    fx = [p[0] for p in plx]
    fy_min, fy_max = min(fy), max(fy)
    fx_min, fx_max = min(fx), max(fx)
    kh2 = fy_max - fy_min + 1
    kw2 = fx_max - fx_min + 1

    w2 = np.zeros((kh2, kw2, p_in, p_in, ci, p_out, p_out, co), w.dtype)
    for oy, piy, khi, qy in ply:
        for ox, pix, kwi, qx in plx:
            w2[oy - fy_min, ox - fx_min, piy, pix, :, qy, qx, :] += \
                w[khi, kwi]
    w2 = w2.reshape(kh2, kw2, p_in * p_in * ci, p_out * p_out * co)
    pads = ((-fy_min, fy_max), (-fx_min, fx_max))
    return w2, pads


def interleave_indices(p2: int, sizes) -> np.ndarray:
    """Gather indices turning a plain lane concat of phase-major tensors
    into the phase-interleaved layout.

    Given tensors with per-phase channel widths ``sizes`` concatenated
    plainly along lanes (``[p2*c0 | p2*c1 | ...]``), ``result[i]`` is the
    source lane of interleaved channel ``i`` (layout ``(q, [c0 c1 ...])``).
    Used to fold ``_phase_cat``'s lane-splitting reshapes into the next
    conv's channel matrix (``phase_conv(in_perm=...)``) — reshaping the
    lane dim at runtime costs a relayout copy per call on TPU.
    """
    offsets = np.cumsum([0] + [p2 * s for s in sizes])
    idx = []
    for q in range(p2):
        for seg, s in enumerate(sizes):
            idx.extend(offsets[seg] + q * s + np.arange(s))
    return np.asarray(idx, np.int64)


def phase_conv(x: Array, w: Array, mode: str, pad: int, p_in: int,
               p_out: int, dtype=None, in_perm: np.ndarray | None = None,
               out_perm: np.ndarray | None = None) -> Array:
    """Apply a phase-folded conv on the base grid.

    ``x``: (B, H, W, p_in^2*ci). The fold of the (traced) weights is a
    static scatter expressed as an einsum with 0/1 placement tensors.

    ``in_perm``: static lane gather such that the conv behaves as if it
    had seen ``x[..., in_perm]`` — the permutation is folded into the
    kernel's input rows (free at runtime) instead of permuting the
    activation. ``out_perm``: likewise for the output lanes; the result
    equals ``y[..., out_perm]`` of the unpermuted conv."""
    kh, kw, ci, co = w.shape
    if mode == "conv":
        s = p_in // p_out
        ply = _placements_conv(kh, pad, s, p_in, p_out)
        plx = _placements_conv(kw, pad, s, p_in, p_out)
    else:
        ply = _placements_deconv(kh, pad, p_in, p_out)
        plx = _placements_deconv(kw, pad, p_in, p_out)
    fy_min = min(p[0] for p in ply)
    fy_max = max(p[0] for p in ply)
    fx_min = min(p[0] for p in plx)
    fx_max = max(p[0] for p in plx)
    kh2 = fy_max - fy_min + 1
    kw2 = fx_max - fx_min + 1

    # placement tensors: Ey[kh, KH2, p_in, p_out], Ex likewise
    ey = np.zeros((kh, kh2, p_in, p_out), np.float32)
    for oy, piy, khi, qy in ply:
        ey[khi, oy - fy_min, piy, qy] = 1.0
    ex = np.zeros((kw, kw2, p_in, p_out), np.float32)
    for ox, pix, kwi, qx in plx:
        ex[kwi, ox - fx_min, pix, qx] = 1.0

    w2 = jnp.einsum("abio,aYpq,bXrs->YXpriqso",
                    w, jnp.asarray(ey, w.dtype), jnp.asarray(ex, w.dtype))
    w2 = w2.reshape(kh2, kw2, p_in * p_in * ci, p_out * p_out * co)
    if in_perm is not None:
        # conv(x[..., g], w2) == conv(x, w2[:, :, argsort(g), :])
        w2 = w2[:, :, np.argsort(np.asarray(in_perm)), :]
    if out_perm is not None:
        w2 = w2[..., np.asarray(out_perm)]

    dtype = dtype or x.dtype
    dn = jax.lax.conv_dimension_numbers(x.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w2.astype(dtype), (1, 1),
        [(-fy_min, fy_max), (-fx_min, fx_max)],
        dimension_numbers=dn)


def ring_mask(h: int, w: int, p: int, width: int = 1) -> np.ndarray:
    """Static multiplier zeroing a ``width``-px border of the FINE grid,
    expressed on the base grid: shape (1, H, W, p*p, 1) to broadcast over
    phase-major channels reshaped as (..., p*p, C).

    Used to emulate the reference's shrink-then-grow conv stacks (k5/p1
    then k1/p1, ``ESMStereo.py:250-253``) with same-size phase convs: the
    shrunk tensor embedded at offset ``width`` in the same-size frame has
    zeros exactly on this ring.
    """
    fine = np.ones((h * p, w * p), np.float32)
    fine[:width] = 0.0
    fine[-width:] = 0.0
    fine[:, :width] = 0.0
    fine[:, -width:] = 0.0
    base = fine.reshape(h, p, w, p).transpose(0, 2, 1, 3).reshape(
        h, w, p * p)
    return base[None, :, :, :, None]


def apply_ring_mask(x: Array, p: int, mask: np.ndarray) -> Array:
    """Multiply phase-major channels (B,H,W,p*p*C) by a ring mask.

    The per-phase mask is expanded to lane level statically (np.repeat):
    reshaping the lane dimension to (p*p, C) at runtime costs a relayout
    copy per call on TPU."""
    b, h, w, pc = x.shape
    c = pc // (p * p)
    lane_mask = np.repeat(mask[..., 0], c, axis=-1)  # (1, H, W, p*p*C)
    return x * jnp.asarray(lane_mask, x.dtype)


def bilinear2x_kernel(channels: int) -> tuple[np.ndarray, tuple]:
    """Constant phase kernel for x2 bilinear upsampling (align_corners=False)
    from plain (p_in=1) to p_out=2, per channel.

    out[2H+q] = 0.75*in[H] + 0.25*in[H + (1 if q else -1)] per axis.
    Returns ``(w2 (3,3,C,4C), pads)`` for a stride-1 base-grid conv.
    """
    taps = {  # q -> {offset: weight}
        0: {-1: 0.25, 0: 0.75},
        1: {0: 0.75, 1: 0.25},
    }
    w2 = np.zeros((3, 3, channels, 2, 2, channels), np.float32)
    for qy, ty in taps.items():
        for oy, wy in ty.items():
            for qx, tx in taps.items():
                for ox, wx in tx.items():
                    for c in range(channels):
                        w2[oy + 1, ox + 1, c, qy, qx, c] += wy * wx
    return w2.reshape(3, 3, channels, 4 * channels), ((1, 1), (1, 1))


def phase_bilinear2x(x: Array, p_in: int = 1) -> Array:
    """x2 bilinear upsample in phase space: (B,H,W,p^2*C) -> (B,H,W,(2p)^2*C).

    For ``p_in == 1`` uses the constant 3x3 kernel; for folded inputs the
    interpolation acts on the fine grid, which equals folding the p_in=1
    kernel — handled by unfold/refold on channels only (no spatial copies
    beyond the conv itself).
    """
    assert p_in == 1, "phase_bilinear2x currently supports plain inputs"
    c = x.shape[-1]
    w2, _ = bilinear2x_kernel(c)
    # border samples clamp to the edge (torch/jax half-pixel semantics),
    # which a zero-padded conv would get wrong: replicate-pad instead.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(xp.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        xp, jnp.asarray(w2, x.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn)
