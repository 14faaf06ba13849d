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

STATUS — TRIED-AND-LOST (round 4, retired to the attic). Interleaved
full-model A/B on L bf16 544x960 (tools/config_ab.py, 3 rounds each,
2026-08-21): plain 13.74-13.90 ms; down pairs fused 14.48-14.49
(+0.65); down+up fused 15.29-15.35 (+1.4). The premise did not hold:
after the depth_block=8 band tuning the hourglass convs are NOT
K-tile-re-read-bound the way the cost-volume stem was — XLA's native
lowering beats the in-kernel banded matmuls, whose padded spans cost
more MACs than XLA's convs and whose DMA/compute do not overlap as
well. Numerically exact and kept tested; both flags stay permanently
off. Hardware lessons preserved in CLAUDE.md (128-aligned DMA lanes,
per-block stage fusion vs vreg spills, window slack rows).
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
    # even row count keeps the clamped-DMA offsets parity-stable (the
    # padded row is masked like any out-of-image row)
    h_pad = h + (h % 2)
    if h_pad != h:
        xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 0), (0, 0)))
    # manual DMA sources must have 128-aligned lane dims (Mosaic slices
    # the HBM memref); pad and slice back after the window load
    lcp = -(-2 * lc // 128) * 128
    if lcp != 2 * lc:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, lcp - 2 * lc)))

    # Output row tile th (divisor of ho). The scratch window's origin is
    # global row 2*r0 - 8 (even, 4 rows of slack below the needed
    # [2*r0-4, 2*r0+2*th+2) range) so every clamped DMA destination
    # offset stays in [0, 8] and even — the same slack scheme as the
    # stem kernel. VMEM budget like the stem kernel.
    itemsize = jnp.dtype(x.dtype).itemsize
    budget = 16 * 1024 * 1024
    th = 1
    for cand in range(ho, 0, -1):
        if ho % cand == 0 and (2 * cand + 14) * wo * lcp * itemsize \
                <= budget:
            th = cand
            break
    ld = min(2 * th + 6, h_pad)

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

        # global input row g lands at window index g - origin,
        # origin = 2*r0 - 8 (even). Clamped DMA with 4 rows of slack on
        # each side; out-of-image rows masked below.
        origin = 2 * r0 - 8
        src = jnp.clip(2 * r0 - 4, 0, h_pad - ld)
        dst = src - origin
        cp = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(src, ld)], win.at[pl.ds(dst, ld)], sem)
        cp.start()
        cp.wait()

        xw = win[...][..., :2 * lc].astype(jnp.float32)
        rg = jax.lax.broadcasted_iota(
            jnp.int32, (2 * th + 14, 1, 1), 0) + origin
        xw = jnp.where((rg >= 0) & (rg < h), xw, 0.0)
        if wo != wo_true:
            cg = jax.lax.broadcasted_iota(jnp.int32, (1, wo, 1), 1)
            xw = jnp.where(cg < wo_true, xw, 0.0)
        # even/odd row planes: window row 2t+par = global row
        # origin + 2t+par
        xw = xw.reshape(th + 7, 2, wo, 2 * lc)

        def shift_prev(v):
            # previous column pair (zero at the left edge = conv zero pad)
            return jnp.concatenate(
                [jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)

        # --- conv A at output rows r0-1 .. r0+th (th+2 rows) ----------
        # output row r (global) reads input rows 2r-1, 2r, 2r+1; with
        # t = r - r0 in [-1, th] and origin 2*r0 - 8:
        #   row 2r-1 = odd plane index t+3, row 2r = even index t+4,
        #   row 2r+1 = odd index t+4
        even = xw[:, 0]
        odd = xw[:, 1]
        rows1 = th + 2
        taps = (odd[2:2 + rows1], even[3:3 + rows1], odd[3:3 + rows1])
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

    # weights at the matmul dtype (VMEM footprint; interpret = fp32)
    args = (*[a.astype(mm_dt) for a in consts["cur_a"]],
            *[a.astype(mm_dt) for a in consts["prev_a"]],
            jnp.concatenate(consts["s_a"])[None],
            jnp.concatenate(consts["t_a"])[None],
            *[a.astype(mm_dt) for a in consts["w_b"]],
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
            pltpu.VMEM((2 * th + 14, wo, lcp), x.dtype),
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


def prepare_up_consts(k_up: Array, bn_up: tuple, k_cat: Array,
                      bn_cat: tuple, k_3: Array, bn_3: tuple, *,
                      depth_in: int, depth_out: int,
                      in_perm: np.ndarray,
                      gelu_approximate: bool) -> dict:
    """Fold the up-level triple into kernel constants.

    ``k_up``: (4,4,4,ci_u,co) ConvTranspose3d k4 s2 p1 weights (torch
    layout (kd,kh,kw,ci,co) as FoldedConvBlock3D stores them);
    ``k_cat``: (1,1,1, 2*co, co) the post-concat 1x1x1 conv whose input
    is the plain lane concat [deconv | skip] viewed through ``in_perm``
    (the depth-interleave, models/folded_agg.py); ``k_3``: (3,3,3,co,co).
    ``depth_in``/``depth_out``: deconv input depth and the (cropped)
    level depth.
    """
    d_s, d2 = depth_in, depth_out
    consts: dict[str, Any] = {"d_s": d_s, "d2": d2,
                              "gelu_approximate": gelu_approximate}

    # --- deconv: k4 s2 p1, output in paired width/row-parity form -----
    from esmstereo_tpu.nn.folded3d import deconv_band_matrix
    band_u, d_full = deconv_band_matrix(4, d_s, 2, 1)
    band_u = band_u[:, :, :d2]                       # depth crop
    ku = k_up.astype(jnp.float32)
    _, _, _, ci_u, co = ku.shape
    inv_u, off_u = _fold_bn(*bn_up)
    blocks_u = _blocks_banded(band_u, ci_u, co)
    # Separable tap structure. Rows: out row 2t (E plane) <- in rows
    # t (kh=1), t-1 (kh=3); out row 2t+1 (O plane) <- in rows t (kh=2),
    # t+1 (kh=0). Columns (independent of rows): out col 2j (even half)
    # <- in cols j (kw=1), j-1 (kw=3); out col 2j+1 (odd half) <- in
    # cols j (kw=2), j+1 (kw=0). Per block: 4 row taps x 3 column
    # matrices (cur / prev-pair / next-pair), each (span, 2nb) with the
    # even|odd output halves side by side.
    mats_u: list[Array] = []
    scales_u, offs_u = [], []
    for (o0, o1, lo, hi) in blocks_u:
        sub = jnp.asarray(band_u[:, lo:hi, o0:o1], jnp.float32)
        w = jnp.einsum("kabio,kde->abdieo", ku, sub)
        w = w.reshape(4, 4, (hi - lo) * ci_u, (o1 - o0) * co)
        nb = (o1 - o0) * co
        z = jnp.zeros(((hi - lo) * ci_u, nb), jnp.float32)
        per_tap = []
        for kh in (1, 3, 2, 0):          # row taps E0, E-1, O0, O+1
            cur = jnp.concatenate([w[kh, 1], w[kh, 2]], axis=1)
            prev = jnp.concatenate([w[kh, 3], z], axis=1)
            nxt = jnp.concatenate([z, w[kh, 0]], axis=1)
            per_tap.extend([prev, cur, nxt])
        # flat tap-major (12, span, 2nb): Mosaic supports only ONE static
        # index into a loaded ref (see fused_agg_stem)
        mats_u.append(jnp.stack(per_tap))            # (12, span, 2nb)
        scales_u.append(jnp.tile(inv_u, o1 - o0))
        offs_u.append(jnp.tile(off_u, o1 - o0))
    consts.update(ci_u=int(ci_u), co=int(co), blocks_u=blocks_u,
                  w_u=mats_u, s_u=scales_u, t_u=offs_u)

    # --- k1 conv on the interleaved concat: split into deconv/skip ----
    # The interleave layout is (depth, [c_up c_skip]) (interleave_indices
    # semantics), so the 1x1x1 conv is block-diagonal over depth with
    # kc[:co] multiplying the deconv channels and kc[co:] the skip
    # channels of the SAME depth. Blocked per output-depth range (the
    # round-4 dense scatter matrix was (2*d2*co)^2 and alone blew the
    # kernel's VMEM budget at level 1).
    kc = k_cat.astype(jnp.float32)[0, 0, 0]          # (2co, co)
    assert kc.ndim == 2 and kc.shape[0] == 2 * co, kc.shape
    # verify the in_perm really is the (depth, [up skip]) interleave the
    # blocking assumes
    from esmstereo_tpu.nn.phasefold import interleave_indices as _ili
    assert np.array_equal(np.asarray(in_perm), _ili(d2, [co, co])), \
        "unexpected concat permutation"
    inv_c, off_c = _fold_bn(*bn_cat)
    db_c = max(1, -(-128 // co))
    blocks_c = [(o0, min(o0 + db_c, d2)) for o0 in range(0, d2, db_c)]

    def blk_diag(m, n):
        out = jnp.zeros((n * m.shape[0], n * m.shape[1]), jnp.float32)
        for i in range(n):
            out = out.at[i * m.shape[0]:(i + 1) * m.shape[0],
                         i * m.shape[1]:(i + 1) * m.shape[1]].set(m)
        return out

    def pair_diag(m):
        z = jnp.zeros_like(m)
        return jnp.concatenate(
            [jnp.concatenate([m, z], axis=1),
             jnp.concatenate([z, m], axis=1)], axis=0)

    wc_up, wc_skip, s_c, t_c = [], [], [], []
    for (o0, o1) in blocks_c:
        wc_up.append(pair_diag(blk_diag(kc[:co], o1 - o0)))
        wc_skip.append(pair_diag(blk_diag(kc[co:], o1 - o0)))
        s_c.append(jnp.tile(inv_c, o1 - o0))
        t_c.append(jnp.tile(off_c, o1 - o0))
    consts.update(blocks_c=blocks_c, wc_up=wc_up, wc_skip=wc_skip,
                  s_c=s_c, t_c=t_c)

    # --- k3 conv in paired width space ---------------------------------
    band3, d2b = conv_band_matrix(3, d2, 1, 1)
    assert d2b == d2
    k3 = k_3.astype(jnp.float32)
    inv3, off3 = _fold_bn(*bn_3)
    blocks3 = _blocks_banded(band3, co, co)
    mats3, scales3, offs3 = [], [], []
    for (o0, o1, lo, hi) in blocks3:
        sub = jnp.asarray(band3[:, lo:hi, o0:o1], jnp.float32)
        w = jnp.einsum("kabio,kde->abdieo", k3, sub)
        w = w.reshape(3, 3, (hi - lo) * co, (o1 - o0) * co)
        span, nb = (hi - lo) * co, (o1 - o0) * co
        z = jnp.zeros((span, nb), jnp.float32)
        per_kh = []
        for kh in range(3):
            # paired: out even col 2j <- in 2j-1 (odd of prev), 2j, 2j+1
            #         out odd col 2j+1 <- in 2j, 2j+1, 2j+2 (even of next)
            cur = jnp.concatenate(
                [jnp.concatenate([w[kh, 1], w[kh, 0]], axis=1),
                 jnp.concatenate([w[kh, 2], w[kh, 1]], axis=1)], axis=0)
            prev = jnp.concatenate(
                [jnp.concatenate([z, z], axis=1),
                 jnp.concatenate([w[kh, 0], z], axis=1)], axis=0)
            nxt = jnp.concatenate(
                [jnp.concatenate([z, w[kh, 2]], axis=1),
                 jnp.concatenate([z, z], axis=1)], axis=0)
            per_kh.extend([prev, cur, nxt])
        mats3.append(jnp.stack(per_kh))              # (9, 2span, 2nb)
        scales3.append(jnp.tile(inv3, o1 - o0))
        offs3.append(jnp.tile(off3, o1 - o0))
    consts.update(blocks_3=blocks3, w_3=mats3, s_3=scales3, t_3=offs3)
    return consts


def fused_up_pair_apply(src: Array, skip: Array, consts: dict, *,
                        interpret: bool = False) -> Array:
    """One hourglass up level: ``k3(k1(cat(deconv(src), skip)))``.

    ``src``: (B, h_s, w_s, d_s*ci_u) coarse input; ``skip``: (B, h2, w2,
    d2*co) with ``h2 <= 2*h_s`` (deconv overhang cropped), ``w2 == 2*w_s``
    even. The 1x1x1 conv sees the depth-interleaved concat through the
    in_perm folded at prepare time. Returns (B, h2, w2, d2*co) in skip's
    dtype. Internally everything runs in paired-width lane space.
    """
    b, h_s, w_s, lc_s = src.shape
    _, h2, w2, l2 = skip.shape
    d_s, d2, co = consts["d_s"], consts["d2"], consts["co"]
    ci_u = consts["ci_u"]
    assert lc_s == d_s * ci_u and l2 == d2 * co, (src.shape, skip.shape)
    assert w2 == 2 * w_s and w2 % 2 == 0 and h2 % 2 == 0, (w2, w_s, h2)
    assert h2 <= 2 * h_s, (h2, h_s)
    approx = consts["gelu_approximate"]
    out_dtype = skip.dtype
    mm_dt = jnp.float32 if interpret else jnp.bfloat16
    wo2 = w2 // 2                      # output pairs == src columns

    skip_p = skip.reshape(b, h2, wo2, 2 * l2)
    wo2_true = wo2
    wo2 = -(-wo2 // 8) * 8
    if wo2 != wo2_true:
        skip_p = jnp.pad(skip_p,
                         ((0, 0), (0, 0), (0, wo2 - wo2_true), (0, 0)))
        src = jnp.pad(src, ((0, 0), (0, 0), (0, wo2 - wo2_true), (0, 0)))
    # manual DMA sources need 128-aligned lane dims (see down kernel)
    lsp = -(-lc_s // 128) * 128
    if lsp != lc_s:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, 0), (0, lsp - lc_s)))
    lkp = -(-2 * l2 // 128) * 128
    if lkp != 2 * l2:
        skip_p = jnp.pad(skip_p,
                         ((0, 0), (0, 0), (0, 0), (0, lkp - 2 * l2)))

    itemsize = jnp.dtype(skip.dtype).itemsize
    budget = 16 * 1024 * 1024
    th2 = 2
    for cand in range(h2, 1, -1):
        if h2 % cand == 0 and cand % 2 == 0 \
                and (cand + 4) * wo2 * lkp * itemsize <= budget:
            th2 = cand
            break
    assert h2 % th2 == 0 and th2 % 2 == 0, (h2, th2)
    nt = th2 // 2 + 2                  # deconv pair-rows per tile
    ld_s = min(nt + 2, h_s)            # src rows per tile
    ld_k = min(th2 + 4, h2)            # skip rows per tile

    n_u = len(consts["w_u"])
    n_c = len(consts["wc_up"])
    n_3 = len(consts["w_3"])

    def kernel(*refs):
        wu_refs = refs[0:n_u]
        su_ref, tu_ref = refs[n_u], refs[n_u + 1]
        wcu_refs = refs[n_u + 2: n_u + 2 + n_c]
        wck_refs = refs[n_u + 2 + n_c: n_u + 2 + 2 * n_c]
        sc_ref, tc_ref = refs[n_u + 2 + 2 * n_c], refs[n_u + 3 + 2 * n_c]
        off = n_u + 4 + 2 * n_c
        w3_refs = refs[off: off + n_3]
        s3_ref, t3_ref = refs[off + n_3], refs[off + n_3 + 1]
        src_ref = refs[off + n_3 + 2]
        skip_ref = refs[off + n_3 + 3]
        out_ref = refs[off + n_3 + 4]
        win_s, win_k, sem_s, sem_k = refs[off + n_3 + 5:]

        bi = pl.program_id(0)
        ti = pl.program_id(1)
        r0 = ti * th2

        # src rows needed: [t0-1, t0+nt+1), t0 = r0/2 - 1 (pair-row
        # origin); window origin t0-3 gives the clamped DMA 2 rows of
        # slack each side (dst in [1, 4])
        t0 = r0 // 2 - 1
        org_s = t0 - 3
        src0 = jnp.clip(t0 - 1, 0, h_s - ld_s)
        cp = pltpu.make_async_copy(
            src_ref.at[bi, pl.ds(src0, ld_s)],
            win_s.at[pl.ds(src0 - org_s, ld_s)], sem_s)
        cp.start()
        # skip rows needed: [r0-2, r0+th2+2); window origin r0-6
        org_k = r0 - 6
        k0 = jnp.clip(r0 - 2, 0, h2 - ld_k)
        cpk = pltpu.make_async_copy(
            skip_ref.at[bi, pl.ds(k0, ld_k)],
            win_k.at[pl.ds(k0 - org_k, ld_k)], sem_k)
        cpk.start()
        cp.wait()
        cpk.wait()

        sw = win_s[...][..., :lc_s].astype(jnp.float32)
        rg_s = jax.lax.broadcasted_iota(
            jnp.int32, (nt + 6, 1, 1), 0) + org_s
        sw = jnp.where((rg_s >= 0) & (rg_s < h_s), sw, 0.0)
        if wo2 != wo2_true:
            cg = jax.lax.broadcasted_iota(jnp.int32, (1, wo2, 1), 1)
            sw = jnp.where(cg < wo2_true, sw, 0.0)

        def shift_prev(v):
            return jnp.concatenate(
                [jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)

        def shift_next(v):
            return jnp.concatenate(
                [v[:, 1:], jnp.zeros_like(v[:, :1])], axis=1)

        # --- deconv + k1, fused PER DEPTH BLOCK (the deconv and the
        # block-diagonal 1x1x1 share the same output-depth partition, so
        # the full-width deconv tensor never materializes — the round-4
        # fp32 full-tensor form spilled ~85 MB of vregs at level 1) ----
        # pair-row t = t0 + v, v in [0, nt): window index of in-row t is
        # t - org_s = v + 3
        s_m1 = sw[2:2 + nt]
        s_0 = sw[3:3 + nt]
        s_p1 = sw[4:4 + nt]
        rows1 = th2 + 2
        # skip rows [r0-1, r0+th2+1) = window indices [5, th2+7); stays
        # in the window dtype (it feeds matmuls only)
        kw1 = win_k[5:5 + rows1]

        z_e, z_o = [], []
        for bix, (o0, o1, lo, hi) in enumerate(consts["blocks_u"]):
            nb = (o1 - o0) * co
            assert (o0, o1) == consts["blocks_c"][bix][:2]

            def mm(v, tap, _bix=bix, _lo=lo, _hi=hi, _nb=nb):
                sl = v[..., _lo * ci_u:_hi * ci_u]
                lhs = sl.reshape(nt * wo2, (_hi - _lo) * ci_u)
                y = jax.lax.dot_general(
                    lhs.astype(mm_dt), wu_refs[_bix][tap].astype(mm_dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return y.reshape(nt, wo2, 2 * _nb)

            # taps: kh=1 (0..2 on row t), kh=3 (3..5 on t-1),
            #       kh=2 (6..8 on t), kh=0 (9..11 on t+1);
            # within each triple: [prev, cur, next] column pair
            def tap3(v, base, _mm=mm):
                return (_mm(shift_prev(v), base)
                        + _mm(v, base + 1)
                        + _mm(shift_next(v), base + 2))

            e = tap3(s_0, 0) + tap3(s_m1, 3)
            o = tap3(s_0, 6) + tap3(s_p1, 9)
            sv = su_ref[...][:, o0 * co:o0 * co + nb]
            tv = tu_ref[...][:, o0 * co:o0 * co + nb]
            sv2 = jnp.concatenate([sv, sv], axis=-1)[None]
            tv2 = jnp.concatenate([tv, tv], axis=-1)[None]
            e = gelu(e * sv2 + tv2, approximate=approx, interpret=interpret)
            o = gelu(o * sv2 + tv2, approximate=approx, interpret=interpret)
            # interleave row parities -> (2nt, wo2, 2nb), then the k1
            # rows [r0-1, r0+th2+1) are indices [1, th2+3). No pre-mask:
            # out-of-image rows carry finite junk that the z mask zeroes.
            y_blk = jnp.stack([e, o], axis=1).reshape(2 * nt, wo2, 2 * nb)
            y1 = y_blk[1:1 + rows1]

            ks = jnp.concatenate(
                [kw1[..., o0 * co:o1 * co],
                 kw1[..., l2 + o0 * co: l2 + o1 * co]], axis=-1)
            zz = (jax.lax.dot_general(
                      y1.reshape(rows1 * wo2, 2 * nb).astype(mm_dt),
                      wcu_refs[bix][...].astype(mm_dt),
                      (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(
                      ks.reshape(rows1 * wo2, 2 * nb).astype(mm_dt),
                      wck_refs[bix][...].astype(mm_dt),
                      (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32)
                  ).reshape(rows1, wo2, 2 * nb)
            sv = sc_ref[...][:, o0 * co:o0 * co + nb]
            tv = tc_ref[...][:, o0 * co:o0 * co + nb]
            sv2 = jnp.concatenate([sv, sv], axis=-1)[None]
            tv2 = jnp.concatenate([tv, tv], axis=-1)[None]
            zz = gelu(zz * sv2 + tv2, approximate=approx,
                      interpret=interpret).astype(mm_dt)
            z_e.append(zz[..., :nb])
            z_o.append(zz[..., nb:])
        z = jnp.concatenate(z_e + z_o, axis=-1)
        rz = jax.lax.broadcasted_iota(
            jnp.int32, (rows1, 1, 1), 0) + (r0 - 1)
        z = jnp.where((rz >= 0) & (rz < h2), z, 0.0).astype(mm_dt)
        if wo2 != wo2_true:
            cg = jax.lax.broadcasted_iota(jnp.int32, (1, wo2, 1), 1)
            z = jnp.where(cg < wo2_true, z, 0.0).astype(mm_dt)

        # --- k3 in paired space (standard banded, tap-major refs) -----
        outs = []
        for bix, (o0, o1, lo, hi) in enumerate(consts["blocks_3"]):
            nb = (o1 - o0) * co
            acc = None
            for kh in range(3):
                zr = z[kh:kh + th2]
                for ci_, zz in ((0, shift_prev(zr)), (1, zr),
                                (2, shift_next(zr))):
                    sl = jnp.concatenate(
                        [zz[..., lo * co:hi * co],
                         zz[..., l2 + lo * co: l2 + hi * co]], axis=-1)
                    lhs = sl.reshape(th2 * wo2, 2 * (hi - lo) * co)
                    y = jax.lax.dot_general(
                        lhs.astype(mm_dt),
                        w3_refs[bix][kh * 3 + ci_].astype(mm_dt),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
            acc = acc.reshape(th2, wo2, 2 * nb)
            sv = s3_ref[...][:, o0 * co:o0 * co + nb]
            tv = t3_ref[...][:, o0 * co:o0 * co + nb]
            sv2 = jnp.concatenate([sv, sv], axis=-1)[None]
            tv2 = jnp.concatenate([tv, tv], axis=-1)[None]
            outs.append(gelu(acc * sv2 + tv2, approximate=approx,
                             interpret=interpret))
        # blocks produced [even_nb | odd_nb]; assemble full halves
        e_all = jnp.concatenate(
            [oo[..., :(b1 - b0) * co]
             for oo, (b0, b1, _, _) in zip(outs, consts["blocks_3"])],
            axis=-1)
        o_all = jnp.concatenate(
            [oo[..., (b1 - b0) * co:]
             for oo, (b0, b1, _, _) in zip(outs, consts["blocks_3"])],
            axis=-1)
        out_ref[0] = jnp.concatenate([e_all, o_all], axis=-1).astype(
            out_dtype)

    # big weight tensors ship at the matmul dtype (halves their VMEM
    # footprint on hardware; interpret stays fp32-exact)
    def wdt(a):
        return a.astype(mm_dt)

    args = (*[wdt(a) for a in consts["w_u"]],
            jnp.concatenate(consts["s_u"])[None],
            jnp.concatenate(consts["t_u"])[None],
            *[wdt(a) for a in consts["wc_up"]],
            *[wdt(a) for a in consts["wc_skip"]],
            jnp.concatenate(consts["s_c"])[None],
            jnp.concatenate(consts["t_c"])[None],
            *[wdt(a) for a in consts["w_3"]],
            jnp.concatenate(consts["s_3"])[None],
            jnp.concatenate(consts["t_3"])[None],
            src, skip_p)

    n_const = n_u + 2 * n_c + n_3 + 6
    run = pl.pallas_call(
        kernel,
        grid=(b, h2 // th2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_const
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec((1, th2, wo2, 2 * l2),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, wo2, 2 * l2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nt + 6, wo2, lsp), src.dtype),
            pltpu.VMEM((th2 + 10, wo2, lkp), skip_p.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
            has_side_effects=False),
        interpret=interpret,
    )
    out = run(*args)
    if wo2 != wo2_true:
        out = out[:, :, :wo2_true]
    # un-pair: (B, h2, wo2, 2*l2) -> (B, h2, w2, l2) (XLA relayout)
    return out.reshape(b, h2, w2, l2)
