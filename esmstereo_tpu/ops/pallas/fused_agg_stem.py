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
                   depth: int, gelu_approximate: bool,
                   input_scale: Array | float | None = None) -> dict:
    """Fold the two (3,3,3,ci,co) kernels + eval BN params into per-block
    banded matmul weights. ``bn1``/``bn2`` are (params, stats) dicts.

    ``input_scale``: dequantization scale of a quantized volume (the
    int8-volume experiment): conv1 is linear, so ``conv(s*q) == s*conv(q)``
    folds the scale into the first kernel for free. May be a traced
    scalar (per-frame dynamic scale).
    """
    d = depth
    consts: dict[str, Any] = {"d": d, "gelu_approximate": gelu_approximate}
    band, _ = conv_band_matrix(3, d, 1, 1)  # (3, d, d) indicator

    for li, (k, bn) in enumerate(((k1, bn1), (k2, bn2))):
        k = k.astype(jnp.float32)
        if li == 0 and input_scale is not None:
            k = k * input_scale
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


def _make_banded_conv(w: int, mm_dt, approx: bool, interpret: bool):
    """Banded conv + BN + GELU on (rows+2, W, d*ci) -> (rows, W, d*co)
    fp32, as per-depth-block matmuls (see the module docstring)."""

    def conv(x, rows, w_refs, blocks, ci, co, s_ref, t_ref):
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

    return conv


def folded_stem_agg_apply(vol: Array, consts: dict, *,
                          out_dtype=None,
                          interpret: bool = False,
                          halo: int = 0,
                          row0: Array | int | None = None,
                          h_global: int | None = None) -> Array:
    """Apply group_stem + agg to the folded volume ``(B, H, W, D*ci)``;
    returns ``(B, H, W, D*co)`` in the volume's dtype (or ``out_dtype``
    — required for quantized int8 volumes, whose dequant scale rides in
    the conv1 weights via ``prepare_consts(input_scale=...)``).

    Sharded execution (parallel.shard_kernels): with ``halo=2`` the input
    is an H-slab carrying 2 exchanged halo rows on each side (shape
    ``(B, h + 4, W, D*ci)`` for ``h`` output rows), ``row0`` is the
    GLOBAL row index of the slab's first interior row (traced per-shard
    scalar, landed in SMEM), and ``h_global`` the un-sharded image
    height: the convs' zero-padding masks then act at the GLOBAL image
    boundary instead of the slab boundary, so per-shard outputs
    concatenate to exactly the monolithic result. ``halo=0`` (default)
    is the single-device behavior, unchanged."""
    b, h_in, w, lc = vol.shape
    assert halo in (0, 2), halo
    h = h_in - 2 * halo
    d = consts["d"]
    ci0, co0 = consts["ci0"], consts["co0"]
    ci1, co1 = consts["ci1"], consts["co1"]
    assert lc == d * ci0, (vol.shape, d, ci0)
    approx = consts["gelu_approximate"]
    out_dtype = out_dtype or vol.dtype
    assert jnp.issubdtype(out_dtype, jnp.floating), out_dtype
    mm_dt = jnp.float32 if interpret else jnp.bfloat16

    # Mosaic requires 8-aligned sublane (width) shapes; non-aligned grids
    # (544x960 cv16 -> w=60) are zero-padded and sliced back. Exact: the
    # padded input columns are zeros (= conv1's own zero padding for
    # cols < w), and conv1's outputs at cols >= w_true (BN offset, not 0)
    # are masked before conv2 exactly like the row halo below.
    w_true = w
    itemsize = jnp.dtype(vol.dtype).itemsize
    # Mosaic sublane tiling is (8,128) fp32 / (16,128) bf16 / (32,128)
    # int8; 8 is proven sufficient for the float dtypes, int8 gets the
    # full tile.
    align = 32 if itemsize == 1 else 8
    w = -(-w // align) * align
    if w != w_true:
        vol = jnp.pad(vol, ((0, 0), (0, 0), (0, w - w_true), (0, 0)))

    # row-block size: divisor of h (OUTPUT rows) with the window < ~16 MB
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
    ld = min(th + 4, h_in)

    # Global-coordinate boundary masking (see docstring): slab row s is
    # global row ``s - halo + row0``; convs zero-pad outside
    # [0, h_global).
    hg = h if h_global is None else int(h_global)
    row0_arr = jnp.reshape(
        jnp.asarray(0 if row0 is None else row0, jnp.int32), (1, 1))

    n_w0 = len(consts["w0"])
    n_w1 = len(consts["w1"])

    def kernel(*refs):
        w0_refs = refs[0:n_w0]
        s0_ref, t0_ref = refs[n_w0], refs[n_w0 + 1]
        w1_refs = refs[n_w0 + 2: n_w0 + 2 + n_w1]
        s1_ref, t1_ref = refs[n_w0 + 2 + n_w1], refs[n_w0 + 3 + n_w1]
        row0_ref = refs[n_w0 + 4 + n_w1]
        vol_ref = refs[n_w0 + 5 + n_w1]
        out_ref = refs[n_w0 + 6 + n_w1]
        win, sem = refs[n_w0 + 7 + n_w1], refs[n_w0 + 8 + n_w1]

        bi = pl.program_id(0)
        ti = pl.program_id(1)
        r0 = ti * th          # first OUTPUT row of this block
        rs = r0 + halo        # its slab row (slab = output rows + halos)
        base = row0_ref[0, 0] - halo   # global row of slab row 0

        # slab row g lives at scratch index g - (rs - 4); the loaded
        # block [src, src+ld) lands at dst in {0..4}, and the fixed
        # window x = win[2:th+6] below then holds slab rows
        # [rs-2, rs+th+2) with unloaded out-of-image rows masked to the
        # convs' zero pad (masks are in GLOBAL coordinates — see
        # docstring).
        src = jnp.clip(rs - 2, 0, h_in - ld)
        dst = src - rs + 4
        cp = pltpu.make_async_copy(
            vol_ref.at[bi, pl.ds(src, ld)], win.at[pl.ds(dst, ld)], sem)
        cp.start()
        cp.wait()

        conv = _make_banded_conv(w, mm_dt, approx, interpret)

        x = win[2:th + 6].astype(jnp.float32)
        rg1 = jax.lax.broadcasted_iota(jnp.int32, (th + 4, 1, 1), 0) \
            + rs - 2 + base
        x = jnp.where((rg1 >= 0) & (rg1 < hg), x, 0.0)
        y1 = conv(x, th + 2, w0_refs, consts["blocks0"], ci0, co0,
                  s0_ref, t0_ref)
        # conv2 zero-pads ITS input at the image boundary: y1's halo rows
        # outside [0, H) carry conv1-of-padding values (BN offset, not 0)
        # and must be masked — interior tiles' halos are real rows.
        ri = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
        rg = rs - 1 + ri + base
        y1 = jnp.where((rg >= 0) & (rg < hg), y1, 0.0)
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
            row0_arr,
            vol)

    n_const = n_w0 + n_w1 + 4
    run = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_const
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pl.ANY)],
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


_EPS = 1e-5


def folded_volume_stem_agg_apply(ref: Array, tgt: Array, consts: dict, *,
                                 num_groups: int, normalize: bool = False,
                                 out_dtype=None,
                                 interpret: bool = False) -> Array:
    """Build the folded gwc/norm-correlation volume IN-KERNEL from the
    matching descriptors and apply group_stem + agg — the cost volume is
    never materialized in HBM.

    Replaces ``correlation_volume_folded`` + ``folded_stem_agg_apply``
    for the cv4/cv8 gwc path (reference math ``submodule.py:143-161`` for
    the volume, ``ESMStereo.py:620-622`` for the convs): the standalone
    pipeline writes the (H/4, W/4, D*G) volume once (~100 MB bf16 at
    544x960 L) and re-reads it for group_stem; here each row block of the
    two descriptor maps (~2 x 1 MB) is read instead, the volume rows live
    only in VMEM, and the convs consume them directly. Exact: the volume
    math mirrors the correlation kernel (including the bf16
    quantize-to-HBM round trip when the descriptors are bf16, so results
    are bit-comparable with the unfused pair).

    ``ref``/``tgt``: (B, H, W, C) descriptors. Returns (B, H, W, D*co).
    """
    b, h, w, c = ref.shape
    d = consts["d"]
    ci0, co0 = consts["ci0"], consts["co0"]
    ci1, co1 = consts["ci1"], consts["co1"]
    assert ci0 == num_groups and c % num_groups == 0, (c, num_groups, ci0)
    cpg = c // num_groups
    approx = consts["gelu_approximate"]
    out_dtype = out_dtype or ref.dtype
    quantize_bf16 = ref.dtype == jnp.bfloat16
    mm_dt = jnp.float32 if interpret else jnp.bfloat16

    # fp32 kernel-side compute (Mosaic rejects sub-128-lane bf16 loads);
    # the upcast fuses into the producer
    ref = ref.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    if normalize:
        def l2n(x):
            xg = x.reshape(b, h, w, num_groups, cpg)
            n = jnp.linalg.norm(xg, axis=-1, keepdims=True)
            return (xg / (n + _EPS)).reshape(b, h, w, c)
        ref, tgt = l2n(ref), l2n(tgt)

    # width alignment (see folded_stem_agg_apply): zero-padded ref/tgt
    # columns produce zero volume columns — the convs' own zero padding
    w_true = w
    w = -(-w // 8) * 8
    if w != w_true:
        zpad = ((0, 0), (0, 0), (0, w - w_true), (0, 0))
        ref = jnp.pad(ref, zpad)
        tgt = jnp.pad(tgt, zpad)
    # manual DMAs require 128-aligned lane (channel) slices; zero-pad the
    # descriptor channels — exact, the group matrix rows for padded
    # channels are zero and 0*0 products add nothing
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        cpad = ((0, 0), (0, 0), (0, 0), (0, c_pad - c))
        ref = jnp.pad(ref, cpad)
        tgt = jnp.pad(tgt, cpad)
    # target window: left-pad d so shift d reads col x-d, right-pad to a
    # sublane-aligned roll width (see ops.pallas.correlation)
    ws = -(-(w + d) // 8) * 8
    tgt = jnp.pad(tgt, ((0, 0), (0, 0), (d, ws - d - w), (0, 0)))

    # shifts packed per MXU matmul (block-diagonal group matrix)
    pack = max(p for p in range(1, d + 1)
               if d % p == 0 and p * num_groups <= 128 and p * c_pad <= 512)
    gmat = np.zeros((pack * c_pad, pack * num_groups), np.float32)
    for i in range(pack):
        for ch in range(c):
            gmat[i * c_pad + ch, i * num_groups + ch // cpg] = 1.0 / cpg
    gmat = jnp.asarray(gmat)

    lc = d * ci0
    budget = 16 * 1024 * 1024
    th = 1
    for cand in range(h, 0, -1):
        if h % cand == 0 and (cand + 4) * w * lc * 4 <= budget:
            th = cand
            break
    ld = min(th + 4, h)

    n_w0 = len(consts["w0"])
    n_w1 = len(consts["w1"])

    def kernel(*refs):
        w0_refs = refs[0:n_w0]
        s0_ref, t0_ref = refs[n_w0], refs[n_w0 + 1]
        w1_refs = refs[n_w0 + 2: n_w0 + 2 + n_w1]
        s1_ref, t1_ref = refs[n_w0 + 2 + n_w1], refs[n_w0 + 3 + n_w1]
        gmat_ref = refs[n_w0 + 4 + n_w1]
        ref_hbm = refs[n_w0 + 5 + n_w1]
        tgt_hbm = refs[n_w0 + 6 + n_w1]
        out_ref = refs[n_w0 + 7 + n_w1]
        rwin, twin, sem_r, sem_t = refs[n_w0 + 8 + n_w1:]

        bi = pl.program_id(0)
        ti = pl.program_id(1)
        r0 = ti * th

        src = jnp.clip(r0 - 2, 0, h - ld)
        dst = src - r0 + 4
        cp_r = pltpu.make_async_copy(
            ref_hbm.at[bi, pl.ds(src, ld)], rwin.at[pl.ds(dst, ld)], sem_r)
        cp_t = pltpu.make_async_copy(
            tgt_hbm.at[bi, pl.ds(src, ld)], twin.at[pl.ds(dst, ld)], sem_t)
        cp_r.start()
        cp_t.start()
        cp_r.wait()
        cp_t.wait()

        # volume rows [r0-2, r0+th+2) built in VMEM, d-major lanes —
        # identical math to _corr_kernel_folded (single disparity block)
        xr = rwin[2:th + 6]                      # (th+4, W, Cp)
        xt = twin[2:th + 6]                      # (th+4, ws, Cp)
        rt = xr.reshape((th + 4) * w, c_pad)
        ref_tile = jnp.concatenate([rt] * pack, axis=-1)
        blocks = []
        for j in range(d // pack):
            shifts = []
            for i in range(j * pack, (j + 1) * pack):
                shifted = pltpu.roll(xt, shift=ws - d + i,
                                     axis=1)[:, :w, :]
                shifts.append(shifted.reshape((th + 4) * w, c_pad))
            prod = ref_tile * jnp.concatenate(shifts, axis=-1)
            if quantize_bf16 and not interpret:
                cost = jnp.dot(prod.astype(jnp.bfloat16),
                               gmat_ref[...].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                # reproduce the standalone pipeline's bf16 HBM round trip
                cost = cost.astype(jnp.bfloat16).astype(jnp.float32)
            else:
                cost = jnp.dot(prod, gmat_ref[...],
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            blocks.append(cost.reshape(th + 4, w, -1))
        x = jnp.concatenate(blocks, axis=-1)     # (th+4, W, D*G) fp32

        rg1 = jax.lax.broadcasted_iota(jnp.int32, (th + 4, 1, 1), 0) + r0 - 2
        x = jnp.where((rg1 >= 0) & (rg1 < h), x, 0.0)

        conv = _make_banded_conv(w, mm_dt, approx, interpret)
        y1 = conv(x, th + 2, w0_refs, consts["blocks0"], ci0, co0,
                  s0_ref, t0_ref)
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
            gmat, ref, tgt)

    n_const = n_w0 + n_w1 + 5
    run = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_const
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((1, th, w, d * co1),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d * co1), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 8, w, c_pad), jnp.float32),
            pltpu.VMEM((th + 8, ws, c_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
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
