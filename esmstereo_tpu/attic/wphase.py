"""W-phase execution of the ESM mixer section (XLA-level, no Pallas).

The upsampler's mixer (to_feat + FMBlock x2 + shuffle-up,
reference ``ESMStereo.py:262-268`` / ``shufflemixer.py:116-132``) runs on
the 1/4 base grid with 16 channels: every op fills 16 of the TPU's 128
lanes and the section costs ~1.3 ms at 544x960 despite trivial FLOPs.
The Pallas fusion of the same section is exact but uncompilable in
budget (44-minute Mosaic compile; see ops/pallas/fused_mixer.py).

This module is the XLA-level alternative: fold P=8 *width* phases into
lanes once ((B, H, W, C) -> (B, H, W/8, 8C) via an identity strided
conv — never a lane reshape, which would cost a relayout copy), run
every op of the section as 128-lane block-structured convs/matmuls, and
unfold at the exit straight into the p=2 phase-major layout the
downstream tail conv expects:

  * 1x1 convs (point MLPs, conv_project, shuffle-up) fold to
    block-diagonal (8ci x 8co) matmuls; the channel split / concat /
    g=8 shuffle of SplitPointMlp fold into those matrices statically;
  * fine k3/k7 convs fold to base-width-3 banded kernels (the same 1-D
    placement algebra as nn.phasefold, applied to W only — H stays
    spatial);
  * the depthwise 7x7 densifies onto the MXU ((7, 3, 128, 128) banded
    kernel: ~440x the MACs of the VPU depthwise but ~16 us of MXU time);
  * ChannelLayerNorm group statistics ride block-diagonal averaging
    matmuls in fp32 (biased variance, eps 1e-5, matching the module).

Equivalence vs the plain lowering: tests/test_shufflemixer_fastpaths.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from esmstereo_tpu.nn.phasefold import _placements_conv

Array = jax.Array

P = 8          # width phases folded into lanes
_C = 16        # mixer channel width
_LN_EPS = 1e-5


def _wfold(k: Array, pad: int):
    """Fold a fine-resolution stride-1 conv kernel ``(kh, kw, ci, co)``
    into the W-phase base-grid equivalent ``(kh, KW2, P*ci, P*co)`` with
    phase-major (q, c) lanes, plus the asymmetric base padding."""
    kh, kw, ci, co = k.shape
    plx = _placements_conv(kw, pad, 1, P, P)
    fx = [p[0] for p in plx]
    fx_min, fx_max = min(fx), max(fx)
    kw2 = fx_max - fx_min + 1
    ex = np.zeros((kw, kw2, P, P), np.float32)
    for ox, pix, kwi, qx in plx:
        ex[kwi, ox - fx_min, pix, qx] = 1.0
    w2 = jnp.einsum("abio,bXrs->aXriso", k, jnp.asarray(ex, k.dtype))
    w2 = w2.reshape(kh, kw2, P * ci, P * co)
    pads = ((kh // 2, kh // 2), (-fx_min, fx_max))
    return w2, pads


def _wconv(x: Array, k: Array, pad: int, dt) -> Array:
    w2, pads = _wfold(k, pad)
    dn = jax.lax.conv_dimension_numbers(x.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x.astype(dt), w2.astype(dt), (1, 1), pads, dimension_numbers=dn)


def _tile(b: Array) -> Array:
    return jnp.tile(b, (P,))


def _shuffle_mat() -> np.ndarray:
    """g=8 channel shuffle as a right-multiplied (16, 16) matrix
    (``shufflemixer.py:37``): out_j = in[perm[j]]."""
    d = _C // 8
    perm = np.empty((_C,), np.int64)
    for j in range(_C):
        dd, g = divmod(j, 8)
        perm[j] = g * d + dd
    s = np.zeros((_C, _C), np.float32)
    s[perm, np.arange(_C)] = 1.0
    return s


def _ln_wphase(v: Array, weight: Array) -> Array:
    """ChannelLayerNorm over each 16-lane phase block (fp32 stats,
    biased variance) — group means via a block-diagonal averaging
    matmul instead of a sub-lane reduction."""
    avg = np.kron(np.eye(P, dtype=np.float32),
                  np.full((_C, _C), 1.0 / _C, np.float32))
    vf = v.astype(jnp.float32)
    a = jnp.asarray(avg)
    mu = jnp.einsum("...i,ij->...j", vf, a)
    ctr = vf - mu
    var = jnp.einsum("...i,ij->...j", ctr * ctr, a)
    wt = jnp.tile(weight.astype(jnp.float32), (P,))
    return ((vf - mu) / jnp.sqrt(var + _LN_EPS) * wt).astype(v.dtype)


def _mlp_wphase(t: Array, mp: dict, dt) -> Array:
    """SplitPointMlp in W-phase lanes: the half-channel split, the
    concat with the untouched half, and the g=8 shuffle all fold into
    the two 1x1 kernels (zero-padded rows/columns + static routing)."""
    half = _C // 2
    k1 = mp["fc1"]["Conv_0"]["kernel"]          # (1, 1, 8, 16)
    b1 = mp["fc1"]["Conv_0"]["bias"]
    k2 = mp["fc2"]["Conv_0"]["kernel"]          # (1, 1, 16, 8)
    b2 = mp["fc2"]["Conv_0"]["bias"]
    s = _shuffle_mat()

    # fc1 reads only the lower half of each phase block: zero-pad the
    # input rows so the kernel is (1, 1, 16, 16) and block-fold it.
    k1f = jnp.pad(k1, ((0, 0), (0, 0), (0, half), (0, 0)))
    h = jax.nn.silu(_wconv(t, k1f, 0, dt) + _tile(b1).astype(dt))

    # fc2 writes the lower half; the upper half passes through from t.
    # Both route through the shuffle matrix.
    sj = jnp.asarray(s, k2.dtype)
    k2f = jnp.pad(k2, ((0, 0), (0, 0), (0, 0), (0, half)))
    k2s = jnp.einsum("abij,jk->abik", k2f, sj)
    skip = np.zeros((1, 1, _C, _C), np.float32)
    skip[0, 0, np.arange(half, _C), np.arange(half, _C)] = 1.0
    ks = jnp.asarray(skip @ s)
    bias = jnp.concatenate([b2, jnp.zeros((half,), b2.dtype)]) @ sj
    return (_wconv(h, k2s, 0, dt) + _wconv(t, ks, 0, dt)
            + _tile(bias).astype(dt))


def _sm_wphase(v: Array, smp: dict, dt) -> Array:
    v = v + _mlp_wphase(_ln_wphase(v, smp["norm1"]["weight"]),
                        smp["mlp1"], dt)
    kd = smp["spatial"]["Conv_0"]["kernel"]     # (7, 7, 1, 16) depthwise
    bd = smp["spatial"]["Conv_0"]["bias"]
    kdense = jnp.einsum("abuo,io->abio", kd,
                        jnp.asarray(np.eye(_C, dtype=np.float32), kd.dtype))
    v = _wconv(v, kdense, kd.shape[1] // 2, dt) + _tile(bd).astype(dt)
    return v + _mlp_wphase(_ln_wphase(v, smp["norm2"]["weight"]),
                           smp["mlp2"], dt)


def _up_perm_idx() -> np.ndarray:
    """Output-lane gather giving the p=2 phase-major ((ry, rx), c) layout
    from the up conv's torch (c, ry, rx) order (matches
    phased_upsample._shuffle_perm_idx(16, 2, 1))."""
    src = []
    for c in range(_C):
        for ry in range(2):
            for rx in range(2):
                src.append((ry * 2 + rx) * _C + c)
    return np.argsort(np.asarray(src, np.int64))


def mixer_wphase(x: Array, params: dict, dtype=None) -> Array:
    """to_feat + FMBlock x2 + shuffle-up, entirely in W-phase lanes.

    ``x``: (B, H, W, Ci) plain base-grid input (W divisible by 8).
    Returns (B, H, W, 64) in the p=2 phase-major layout (identical to
    ``ops.pallas.fused_mixer.mixer_reference``, up to float
    reassociation of the folded matmuls).
    """
    dt = dtype or x.dtype
    b, hh, ww, ci = x.shape
    assert ww % P == 0, (ww, P)

    # entry: identity space-to-depth along W (strided conv, no relayout)
    s2d = np.zeros((1, P, ci, P * ci), np.float32)
    for q in range(P):
        s2d[0, q, np.arange(ci), q * ci + np.arange(ci)] = 1.0
    dn = jax.lax.conv_dimension_numbers(x.shape, s2d.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    v = jax.lax.conv_general_dilated(
        x.astype(dt), jnp.asarray(s2d, dt), (1, P), [(0, 0), (0, 0)],
        dimension_numbers=dn)

    v = _wconv(v, params["to_feat"]["Conv_0"]["kernel"], 1, dt)
    for bi in (0, 1):
        blk = params[f"block{bi}"]
        y = _sm_wphase(_sm_wphase(v, blk["sm1"], dt), blk["sm2"], dt)
        x2 = y + v
        z = jax.nn.silu(
            _wconv(x2, blk["conv_expand"]["Conv_0"]["kernel"], 1, dt)
            + _tile(blk["conv_expand"]["Conv_0"]["bias"]).astype(dt))
        z = (_wconv(z, blk["conv_project"]["Conv_0"]["kernel"], 0, dt)
             + _tile(blk["conv_project"]["Conv_0"]["bias"]).astype(dt))
        v = z + x2

    idx = _up_perm_idx()
    uk = params["up"]["conv"]["Conv_0"]["kernel"][:, :, :, idx]
    ub = params["up"]["conv"]["Conv_0"]["bias"][idx]
    y = jax.nn.silu(_wconv(v, uk, 0, dt) + _tile(ub).astype(dt))

    # exit: inverse space-to-depth along W into the p=2 phase layout
    co = 4 * _C
    inv = np.zeros((1, P, P * co, co), np.float32)
    for q in range(P):
        inv[0, q, q * co + np.arange(co), np.arange(co)] = 1.0
    kinv = jnp.flip(jnp.asarray(inv, dt), axis=1)
    dn = jax.lax.conv_dimension_numbers(y.shape, kinv.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        y, kinv, (1, 1), [(0, 0), (P - 1, P - 1)], lhs_dilation=(1, P),
        dimension_numbers=dn)
