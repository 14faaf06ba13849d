"""Fused Pallas kernels for the aggregation hourglass's down-path pairs.

Counterpart of the reference hourglass's per-level conv pairs
(``/root/reference/models/ESMStereo.py:129-182``: ``conv1 = conv1_1(
conv1_0(x))`` etc., each BasicConv 3x3x3 stride 2 then stride 1), on the
depth-folded layout (``nn.folded3d``).

Why a kernel: same pathology the stem+agg kernel fixed
(``fused_agg_stem.py``) — XLA's conv emitter re-reads rows and the
materialized folded weight per K-/M-tile at the banded convs'
~1.5-5k-wide contractions. Each hourglass level is exactly a
(stride-2 k3, stride-1 k3) pair, so one kernel per level streams the
level input once and runs both convs in VMEM.

TPU-native formulation of the stride-2 conv:

  * the W stride is folded into LANES before the kernel: the caller
    reshapes ``(H, W, L) -> (H, W/2, 2L)`` (an XLA relayout, a few MB),
    pairing adjacent columns. Output column ``j`` of a k3 s2 p1 conv
    reads input columns ``2j-1, 2j, 2j+1``: columns ``2j, 2j+1`` are
    pair ``j`` and ``2j-1`` is the odd half of pair ``j-1`` — so the
    conv is TWO banded matmuls per row tap (current pair + previous
    pair) instead of three, with zero sublane-strided accesses;
  * the H stride works on an even-aligned row window viewed as
    ``(n, 2, W/2, 2L)``: even/odd row planes are static indices, and
    every strided row access is a plain dynamic-free slice;
  * the depth stride rides in the band matrix
    (``conv_band_matrix(3, d, 2, 1)``), blocked to 128-lane-aligned
    spans exactly like the stem kernel.

Eval-only (BN folded); exactness vs the FoldedConvBlock3D pair is
covered by tests/test_fused_hourglass.py (interpret mode) and the
integrated model path by tests/test_fused_integration.py.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esmstereo_tpu.nn.folded3d import conv_band_matrix
from esmstereo_tpu.ops.pallas.activations import gelu
from esmstereo_tpu.ops.pallas.fused_agg_stem import (
    _fold_bn,
    _make_banded_conv,
)

Array = jax.Array


def _blocks_banded(band: np.ndarray, ci: int, co: int
                   ) -> list[tuple[int, int, int, int]]:
    """Output-depth blocking for an arbitrary (kd, din, dout) band:
    blocks of ``ceil(128/co)`` output depths with input spans taken from
    the band's support, widened to 128-lane alignment."""
    d_in, d_out = band.shape[1], band.shape[2]
    db = max(1, -(-128 // co))
    q = 128 // math.gcd(ci, 128)
    out = []
    support = band.sum(axis=0)  # (din, dout)
    for o0 in range(0, d_out, db):
        o1 = min(o0 + db, d_out)
        rows = np.nonzero(support[:, o0:o1].sum(axis=1))[0]
        lo, hi = (int(rows[0]), int(rows[-1]) + 1) if len(rows) else (0, 1)
        lo = (lo // q) * q
        hi = min(d_in, -(-hi // q) * q)
        out.append((o0, o1, lo, hi))
    return out


def prepare_pair_consts(k1: Array, bn1: tuple, k2: Array, bn2: tuple, *,
                        depth: int, gelu_approximate: bool) -> dict:
    """Fold the (s2, s1) conv kernels + eval BNs into the kernel's
    constant layout. ``k1``/``k2`` are (3,3,3,ci,co) torch-layout; the
    s2 conv's width taps are assembled into paired-lane matrices."""
    d0 = depth
    consts: dict[str, Any] = {"d0": d0, "gelu_approximate": gelu_approximate}

    # --- conv A: k3 s2 p1 (depth-strided band, paired width lanes) ----
    band_a, d1 = conv_band_matrix(3, d0, 2, 1)
    ka = k1.astype(jnp.float32)
    _, _, _, ci_a, co_a = ka.shape
    inv_a, off_a = _fold_bn(*bn1)
    blocks_a = _blocks_banded(band_a, ci_a, co_a)
    cur_mats, prev_mats, scales_a, offs_a = [], [], [], []
    for (o0, o1, lo, hi) in blocks_a:
        sub = jnp.asarray(band_a[:, lo:hi, o0:o1], jnp.float32)
        # (kh, kw, span*ci, dblk*co)
        w = jnp.einsum("kabio,kde->abdieo", ka, sub)
        w = w.reshape(3, 3, (hi - lo) * ci_a, (o1 - o0) * co_a)
        span_l = (hi - lo) * ci_a
        zero = jnp.zeros_like(w[:, 0])
        # paired-lane input [even | odd]: cur pair holds cols (2j, 2j+1)
        # = kw taps 1, 2; prev pair's odd half is col 2j-1 = kw tap 0
        cur = jnp.concatenate([w[:, 1], w[:, 2]], axis=1)    # (3, 2span, n)
        prev = jnp.concatenate([zero, w[:, 0]], axis=1)
        del span_l
        cur_mats.append(cur)
        prev_mats.append(prev)
        scales_a.append(jnp.tile(inv_a, o1 - o0))
        offs_a.append(jnp.tile(off_a, o1 - o0))
    consts.update(d1=d1, ci_a=int(ci_a), co_a=int(co_a),
                  blocks_a=blocks_a, cur_a=cur_mats, prev_a=prev_mats,
                  s_a=scales_a, t_a=offs_a)

    # --- conv B: k3 s1 p1 (the stem-kernel banded form) ----------------
    band_b, d1b = conv_band_matrix(3, d1, 1, 1)
    assert d1b == d1
    kb = k2.astype(jnp.float32)
    _, _, _, ci_b, co_b = kb.shape
    inv_b, off_b = _fold_bn(*bn2)
    blocks_b = _blocks_banded(band_b, ci_b, co_b)
    mats_b, scales_b, offs_b = [], [], []
    for (o0, o1, lo, hi) in blocks_b:
        sub = jnp.asarray(band_b[:, lo:hi, o0:o1], jnp.float32)
        w = jnp.einsum("kabio,kde->abdieo", kb, sub)
        w = w.reshape(9, (hi - lo) * ci_b, (o1 - o0) * co_b)
        mats_b.append(w)
        scales_b.append(jnp.tile(inv_b, o1 - o0))
        offs_b.append(jnp.tile(off_b, o1 - o0))
    consts.update(ci_b=int(ci_b), co_b=int(co_b), blocks_b=blocks_b,
                  w_b=mats_b, s_b=scales_b, t_b=offs_b)
    return consts


def fused_down_pair_apply(x: Array, consts: dict, *,
                          interpret: bool = False) -> Array:
    """One hourglass down level: ``convB(convA(x))`` with convA k3 s2 p1
    and convB k3 s1 p1 (both + folded BN + GELU).

    ``x``: (B, H, W, d0*ci) with H, W even; returns
    (B, ceil(H/2), W/2, d1*co) in ``x``'s dtype.
    """
    b, h, w, lc = x.shape
    d0, d1 = consts["d0"], consts["d1"]
    ci_a, co_a = consts["ci_a"], consts["co_a"]
    ci_b, co_b = consts["ci_b"], consts["co_b"]
    assert lc == d0 * ci_a, (x.shape, d0, ci_a)
    assert w % 2 == 0, ("width must be even for lane pairing", w)
    approx = consts["gelu_approximate"]
    out_dtype = x.dtype
    mm_dt = jnp.float32 if interpret else jnp.bfloat16
    ho, wo = (h + 1) // 2, w // 2

    # pair adjacent columns into lanes (XLA-level relayout, a few MB)
    xp = x.reshape(b, h, wo, 2 * lc)

    # pad the paired width to the Mosaic sublane multiple
    wo_true = wo
    wo = -(-wo // 8) * 8
    if wo != wo_true:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wo - wo_true), (0, 0)))

    # Output row tile th (divisor of ho); the window holds input rows
    # [2*r0-4, 2*r0-4+ld) with ld = 2*th+6 (even start keeps row parity
    # static). VMEM budget like the stem kernel.
    itemsize = jnp.dtype(x.dtype).itemsize
    budget = 16 * 1024 * 1024
    th = 1
    for cand in range(ho, 0, -1):
        if ho % cand == 0 and (2 * cand + 6) * wo * 2 * lc * itemsize \
                <= budget:
            th = cand
            break
    ld = min(2 * th + 6, h)

    n_cur = len(consts["cur_a"])
    n_wb = len(consts["w_b"])

    def kernel(*refs):
        cur_refs = refs[0:n_cur]
        prev_refs = refs[n_cur:2 * n_cur]
        sa_ref, ta_ref = refs[2 * n_cur], refs[2 * n_cur + 1]
        wb_refs = refs[2 * n_cur + 2: 2 * n_cur + 2 + n_wb]
        sb_ref, tb_ref = refs[2 * n_cur + 2 + n_wb], \
            refs[2 * n_cur + 3 + n_wb]
        x_ref = refs[2 * n_cur + 4 + n_wb]
        out_ref = refs[2 * n_cur + 5 + n_wb]
        win, sem = refs[2 * n_cur + 6 + n_wb], refs[2 * n_cur + 7 + n_wb]

        bi = pl.program_id(0)
        ti = pl.program_id(1)
        r0 = ti * th                       # first OUTPUT row of the tile

        # global input row g lands at window index g - ws, ws = 2*r0 - 4
        # (even). Clamped DMA; out-of-image rows masked below.
        ws = 2 * r0 - 4
        src = jnp.clip(ws, 0, h - ld)
        dst = src - ws
        cp = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(src, ld)], win.at[pl.ds(dst, ld)], sem)
        cp.start()
        cp.wait()

        xw = win[...].astype(jnp.float32)
        rg = jax.lax.broadcasted_iota(
            jnp.int32, (2 * th + 6, 1, 1), 0) + ws
        xw = jnp.where((rg >= 0) & (rg < h), xw, 0.0)
        if wo != wo_true:
            cg = jax.lax.broadcasted_iota(jnp.int32, (1, wo, 1), 1)
            xw = jnp.where(cg < wo_true, xw, 0.0)
        # even/odd row planes: window row 2t+par = global row ws + 2t+par
        xw = xw.reshape(th + 3, 2, wo, 2 * lc)

        def shift_prev(v):
            # previous column pair (zero at the left edge = conv zero pad)
            return jnp.concatenate(
                [jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)

        # --- conv A at output rows r0-1 .. r0+th (th+2 rows) ----------
        # output row r (global) reads input rows 2r-1, 2r, 2r+1; with
        # t = r - r0 in [-1, th]:
        #   row 2r-1 = odd plane index t+1, row 2r = even index t+2,
        #   row 2r+1 = odd index t+2
        even = xw[:, 0]
        odd = xw[:, 1]
        rows1 = th + 2
        taps = (odd[0:rows1], even[1:1 + rows1], odd[1:1 + rows1])
        taps_p = tuple(shift_prev(t) for t in taps)
        outs = []
        for bix, (o0, o1, lo, hi) in enumerate(consts["blocks_a"]):
            acc = None
            for dh in range(3):
                for mats, tap in ((cur_refs, taps[dh]),
                                  (prev_refs, taps_p[dh])):
                    sl = jnp.concatenate(
                        [tap[..., lo * ci_a:hi * ci_a],
                         tap[..., lc + lo * ci_a: lc + hi * ci_a]],
                        axis=-1)
                    lhs = sl.reshape(rows1 * wo, 2 * (hi - lo) * ci_a)
                    y = jax.lax.dot_general(
                        lhs.astype(mm_dt), mats[bix][dh].astype(mm_dt),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
            nb = (o1 - o0) * co_a
            acc = acc.reshape(rows1, wo, nb)
            sv = sa_ref[...][:, o0 * co_a:o0 * co_a + nb]
            tv = ta_ref[...][:, o0 * co_a:o0 * co_a + nb]
            yb = acc * sv[None] + tv[None]
            outs.append(gelu(yb, approximate=approx, interpret=interpret))
        y1 = jnp.concatenate(outs, axis=-1)

        # conv B zero-pads at the OUTPUT image boundary: mask halo rows
        rb = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1, 1), 0) + r0 - 1
        y1 = jnp.where((rb >= 0) & (rb < ho), y1, 0.0)
        if wo != wo_true:
            cg = jax.lax.broadcasted_iota(jnp.int32, (1, wo, 1), 1)
            y1 = jnp.where(cg < wo_true, y1, 0.0)

        conv = _make_banded_conv(wo, mm_dt, approx, interpret)
        y2 = conv(y1, th, wb_refs, consts["blocks_b"], ci_b, co_b,
                  sb_ref, tb_ref)
        out_ref[0] = y2.astype(out_dtype)

    args = (*consts["cur_a"], *consts["prev_a"],
            jnp.concatenate(consts["s_a"])[None],
            jnp.concatenate(consts["t_a"])[None],
            *consts["w_b"],
            jnp.concatenate(consts["s_b"])[None],
            jnp.concatenate(consts["t_b"])[None],
            xp)

    n_const = 2 * n_cur + n_wb + 4
    run = pl.pallas_call(
        kernel,
        grid=(b, ho // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_const
        + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, th, wo, d1 * co_b),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, d1 * co_b), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * th + 6, wo, 2 * lc), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            has_side_effects=False),
        interpret=interpret,
    )
    out = run(*args)
    if wo != wo_true:
        out = out[:, :, :wo_true]
    return out
