"""Fused Pallas kernel for the cost-volume entry convs (group_stem + agg).

Counterpart of the reference's first two 3-D convs over the cost volume
(``/root/reference/models/ESMStereo.py:620-622``: ``group_stem`` 32->8 and
``agg`` 8->8, both BasicConv 3x3x3 + BN + GELU), executed on the
depth-folded layout (see ``nn.folded3d``).

Why a kernel: the folded formulation turns each 3-D conv into a 2-D conv
whose contraction side is ``9 * span * C_in`` (up to ~5-14k). XLA's TPU
conv emitter re-reads the input rows and the materialized folded weight
per K-/M-tile at that size — measured **2.37 ms for group_stem alone** at
544x960 L bf16 (vs a 0.4 ms MAC bound; ``tools/agg_experiments.py``), plus
0.40 ms for agg. This kernel streams each row block of the raw
``(H, W, D*G)`` volume from HBM exactly once, keeps it in VMEM, and runs
both banded convs as block matmuls with 128-lane-aligned depth spans
(band rows outside the true span carry zero weights — exact), fusing the
eval-mode BatchNorms and GELUs into the epilogue.

Eval-only (BN running stats folded); exactness vs the FoldedConvBlock3D
pair is covered by tests/test_fused_agg_stem.py (interpret mode).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esmstereo_tpu.nn.folded3d import conv_band_matrix

Array = jax.Array

_BN_EPS = 1e-5


def _fold_bn(p: dict, s: dict):
    scale = p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32)
    mean = s["mean"].astype(jnp.float32)
    var = s["var"].astype(jnp.float32)
    inv = scale * jax.lax.rsqrt(var + _BN_EPS)
    return inv, bias - mean * inv


def _blocks(d: int, ci: int, co: int) -> list[tuple[int, int, int, int]]:
    """Depth blocking for a k3 s1 p1 banded conv: output blocks of
    ``db = ceil(128/co)`` depths with input spans widened to 128-lane
    alignment (``lo*ci`` and ``hi*ci`` multiples of 128 where possible).
    Returns [(o0, o1, lo, hi)]."""
    db = max(1, -(-128 // co))
    q = 128 // math.gcd(ci, 128)
    out = []
    for o0 in range(0, d, db):
        o1 = min(o0 + db, d)
        lo, hi = max(0, o0 - 1), min(d, o1 + 1)
        lo = (lo // q) * q
        hi = min(d, -(-hi // q) * q)
        out.append((o0, o1, lo, hi))
    return out


def prepare_consts(k1: Array, bn1: tuple, k2: Array, bn2: tuple, *,
                   depth: int, gelu_approximate: bool) -> dict:
    """Fold the two (3,3,3,ci,co) kernels + eval BN params into per-block
    banded matmul weights. ``bn1``/``bn2`` are (params, stats) dicts."""
    d = depth
    consts: dict[str, Any] = {"d": d, "gelu_approximate": gelu_approximate}
    band, _ = conv_band_matrix(3, d, 1, 1)  # (3, d, d) indicator

    for li, (k, bn) in enumerate(((k1, bn1), (k2, bn2))):
        k = k.astype(jnp.float32)
        _, _, _, ci, co = k.shape
        inv, off = _fold_bn(*bn)
        blocks = _blocks(d, ci, co)
        mats, scales, offs = [], [], []
        for (o0, o1, lo, hi) in blocks:
            # (kd, span, dout_blk) band restricted to this block
            sub = jnp.asarray(band[:, lo:hi, o0:o1], jnp.float32)
            # (kh*kw, span*ci, dblk*co) — tap-major so the kernel can
            # index the ref with ONE static integer (2-int indexing of a
            # loaded rank-4 value lowers to an unsupported >2D gather)
            w = jnp.einsum("kabio,kde->abdieo", k, sub)
            w = w.reshape(9, (hi - lo) * ci, (o1 - o0) * co)
            mats.append(w)
            scales.append(jnp.tile(inv, o1 - o0))
            offs.append(jnp.tile(off, o1 - o0))
        consts[f"w{li}"] = mats
        consts[f"s{li}"] = scales
        consts[f"t{li}"] = offs
        consts[f"blocks{li}"] = blocks
        consts[f"ci{li}"] = int(ci)
        consts[f"co{li}"] = int(co)
    return consts


def _gelu(x: Array, approximate: bool, interpret: bool) -> Array:
    # Mosaic has no erf lowering; exact mode compiles via the A&S
    # rational erf (see ops.pallas.activations).
    from esmstereo_tpu.ops.pallas.activations import gelu
    return gelu(x, approximate=approximate, interpret=interpret)


def folded_stem_agg_apply(vol: Array, consts: dict, *,
                          interpret: bool = False) -> Array:
    """Apply group_stem + agg to the folded volume ``(B, H, W, D*ci)``;
    returns ``(B, H, W, D*co)`` in the volume's dtype."""
    b, h, w, lc = vol.shape
    d = consts["d"]
    ci0, co0 = consts["ci0"], consts["co0"]
    ci1, co1 = consts["ci1"], consts["co1"]
    assert lc == d * ci0, (vol.shape, d, ci0)
    approx = consts["gelu_approximate"]
    out_dtype = vol.dtype
    mm_dt = jnp.float32 if interpret else jnp.bfloat16

    # Mosaic requires 8-aligned sublane (width) shapes; non-aligned grids
    # (544x960 cv16 -> w=60) are zero-padded and sliced back. Exact: the
    # padded input columns are zeros (= conv1's own zero padding for
    # cols < w), and conv1's outputs at cols >= w_true (BN offset, not 0)
    # are masked before conv2 exactly like the row halo below.
    w_true = w
    w = -(-w // 8) * 8
    if w != w_true:
        vol = jnp.pad(vol, ((0, 0), (0, 0), (0, w - w_true), (0, 0)))

    # row-block size: divisor of h with the volume window under ~16 MB
    itemsize = jnp.dtype(vol.dtype).itemsize
    budget = 16 * 1024 * 1024
    th = 1
    for cand in range(h, 0, -1):
        if h % cand == 0 and (cand + 4) * w * lc * itemsize <= budget:
            th = cand
            break

    # Halo rows (conv1 needs [-1, th+1), conv2 another +-1) come from a
    # CLAMPED DMA landed at a shifted scratch offset, with out-of-image
    # rows masked in-kernel — not from jnp.pad, which would materialize a
    # second full copy of the volume in HBM (~100 MB of pure traffic at
    # 544x960 L) just to add 4 halo rows. h is an outer dim of the rank-4
    # volume (lanes = lc, sublanes = w), so any row offset is legal.
    ld = min(th + 4, h)

    n_w0 = len(consts["w0"])
    n_w1 = len(consts["w1"])

    def kernel(*refs):
        w0_refs = refs[0:n_w0]
        s0_ref, t0_ref = refs[n_w0], refs[n_w0 + 1]
        w1_refs = refs[n_w0 + 2: n_w0 + 2 + n_w1]
        s1_ref, t1_ref = refs[n_w0 + 2 + n_w1], refs[n_w0 + 3 + n_w1]
        vol_ref = refs[n_w0 + 4 + n_w1]
        out_ref = refs[n_w0 + 5 + n_w1]
        win, sem = refs[n_w0 + 6 + n_w1], refs[n_w0 + 7 + n_w1]

        bi = pl.program_id(0)
        ti = pl.program_id(1)
        r0 = ti * th

        # global row g lives at scratch index g - (r0 - 4); the loaded
        # block [src, src+ld) lands at dst in {0..4}, and the fixed
        # window x = win[2:th+6] below then holds rows [r0-2, r0+th+2)
        # with unloaded out-of-image rows masked to the convs' zero pad.
        src = jnp.clip(r0 - 2, 0, h - ld)
        dst = src - r0 + 4
        cp = pltpu.make_async_copy(
            vol_ref.at[bi, pl.ds(src, ld)], win.at[pl.ds(dst, ld)], sem)
        cp.start()
        cp.wait()

        def conv(x, rows, w_refs, blocks, ci, co, s_ref, t_ref):
            """Banded conv + BN + GELU on (rows+2, W, d*ci) -> list of
            per-depth-block (rows, W, blk*co) fp32, concatenated."""
            outs = []
            for bix, (o0, o1, lo, hi) in enumerate(blocks):
                acc = None
                for kh in range(3):
                    xr = x[kh:kh + rows]
                    for kw in range(3):
                        dx = kw - 1
                        if dx < 0:
                            xs = jnp.concatenate(
                                [jnp.zeros_like(xr[:, :1]), xr[:, :-1]],
                                axis=1)
                        elif dx > 0:
                            xs = jnp.concatenate(
                                [xr[:, 1:], jnp.zeros_like(xr[:, :1])],
                                axis=1)
                        else:
                            xs = xr
                        sl = xs[..., lo * ci:hi * ci]
                        lhs = sl.reshape(rows * w, (hi - lo) * ci)
                        y = jax.lax.dot_general(
                            lhs.astype(mm_dt),
                            w_refs[bix][kh * 3 + kw].astype(mm_dt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc = y if acc is None else acc + y
                nb = (o1 - o0) * co
                acc = acc.reshape(rows, w, nb)
                # scale/bias rows are (1, d*co); slice then expand — a
                # combined [None, None, slice] index on a 1-D value
                # lowers to an unsupported >2D gather in Mosaic
                sv = s_ref[...][:, o0 * co:o0 * co + nb]
                tv = t_ref[...][:, o0 * co:o0 * co + nb]
                yb = acc * sv[None] + tv[None]
                outs.append(_gelu(yb, approx, interpret))
            return jnp.concatenate(outs, axis=-1)

        x = win[2:th + 6].astype(jnp.float32)
        rg1 = jax.lax.broadcasted_iota(jnp.int32, (th + 4, 1, 1), 0) + r0 - 2
        x = jnp.where((rg1 >= 0) & (rg1 < h), x, 0.0)
        y1 = conv(x, th + 2, w0_refs, consts["blocks0"], ci0, co0,
                  s0_ref, t0_ref)
        # conv2 zero-pads ITS input at the image boundary: y1's halo rows
        # outside [0, H) carry conv1-of-padding values (BN offset, not 0)
        # and must be masked — interior tiles' halos are real rows.
        ri = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
        rg = r0 - 1 + ri
        y1 = jnp.where((rg >= 0) & (rg < h), y1, 0.0)
        if w != w_true:
            cg = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
            y1 = jnp.where(cg < w_true, y1, 0.0)
        y2 = conv(y1, th, w1_refs, consts["blocks1"], ci1, co1,
                  s1_ref, t1_ref)
        out_ref[0] = y2.astype(out_dtype)

    args = (*consts["w0"],
            jnp.concatenate(consts["s0"])[None],
            jnp.concatenate(consts["t0"])[None],
            *consts["w1"],
            jnp.concatenate(consts["s1"])[None],
            jnp.concatenate(consts["t1"])[None],
            vol)

    n_const = n_w0 + n_w1 + 4
    run = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_const
        + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, th, w, d * co1),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d * co1), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 8, w, lc), vol.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            has_side_effects=False),
        interpret=interpret,
    )
    out = run(*args)
    if w != w_true:
        out = out[:, :, :w_true]
    return out
