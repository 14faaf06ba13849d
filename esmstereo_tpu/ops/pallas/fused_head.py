"""Fused Pallas kernel for the backbone head: stem + stage-0 DS blocks.

Counterpart of the reference's timm stem + ``blocks[0]`` slice executed by
``Feature.forward`` (``/root/reference/models/ESMStereo.py:40-77``). On TPU
the plain XLA lowering of this section is pure HBM traffic: the 1/2-res
tensors carry 16-32 channels, so every BatchNorm / SiLU / SE / residual
materializes a 17-33 MB tensor at 12-25% lane utilization — measured
3.7 ms of a 23 ms frame at 544x960 (stem 0.32 + stage0 3.39 ms), with the
whole model sitting exactly on its HBM roofline (cost analysis: stage0
alone moves ~2.9 GB).

This kernel runs the section in a **flat-lane layout** — rows are
``(H, W*C)`` vectors, so the lane dimension is a multiple of 128 for any
channel count — and keeps every intermediate in VMEM:

  * depthwise 3x3 convs are 9 shifted FMAs on the VPU; w-shifts are lane
    rolls by C with a zeroed wrap column,
  * pointwise convs are MXU matmuls against block-diagonal
    ``kron(I_px, W)`` weights (the structural-zero MACs are free — the
    MXU is ~2% utilized in this section),
  * the stride-2 stem is 6 matmuls over even/odd row+column-packed image
    planes,
  * eval-mode BatchNorms are folded into the conv taps,
  * SqueezeExcite's global mean forces multiple passes: the grid is
    ``(batch, phase, row_tile)``. Phase 0 accumulates block-0's channel
    sums; phase 1 recomputes the prefix (cheaper than spilling it),
    applies gate 0, emits block-0's output y0 to HBM (row-padded) and
    accumulates block-1's sums; phase 2 reads y0 back and finishes
    block 1. Sums/gates persist in VMEM scratch across grid steps (TPU
    grids execute sequentially).

HBM traffic: image 2-3x + y0 round-trip + output ≈ 90 MB, vs ~2.9 GB for
the XLA lowering. Eval-mode only; exactness vs the plain modules is
covered by tests/test_fused_head.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class _BlockConsts:
    """Trace-time constants for one DS block (BN folded)."""

    taps: Array          # (9, W*Cin)  dw taps * bn1 scale, tiled over W
    dw_bias: Array       # (1, W*Cin)  bn1 bias, tiled
    se_w1: Array         # (Cin, red)  (zeros placeholder when no SE)
    se_b1: Array
    se_w2: Array
    se_b2: Array
    pw_bd: Array         # (px*Cin, px*Cout)  kron(I_px, pw * bn2 scale)
    pw_bias: Array       # (1, W*Cout) bn2 bias, tiled
    cin: int
    cout: int
    has_se: bool
    residual: bool


def _fold_bn(scale, bias, mean, var):
    s = scale * jax.lax.rsqrt(var.astype(jnp.float32) + _BN_EPS)
    return s, bias - mean * s


def _block_diag(w: Array, px: int) -> Array:
    """kron(I_px, w): (px*ci, px*co) block-diagonal expansion."""
    ci, co = w.shape
    eye = jnp.eye(px, dtype=w.dtype)
    bd = eye[:, :, None, None] * w[None, None]
    return bd.transpose(0, 2, 1, 3).reshape(px * ci, px * co)


def _pw_px(cin: int, cout: int) -> int:
    """Pixels per block-diag group so that both the input and output lane
    groups are multiples of 128."""
    g = 128 // math.gcd(cin, 128)
    h = 128 // math.gcd(cout, 128)
    return g * h // math.gcd(g, h)


def _act(x: Array, act: str) -> Array:
    if act == "silu":
        return jax.nn.silu(x)
    if act == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    raise ValueError(act)


def _roll(x: Array, m: int, interpret: bool) -> Array:
    """Circular lane roll with no wrap masking: callers must zero the
    boundary-pixel taps statically (see prepare_consts) so the wrapped
    lanes are multiplied by zero."""
    if interpret:
        return jnp.roll(x, m, axis=1)
    return pltpu.roll(x, m % x.shape[-1], axis=1)


def _shift_flat(x: Array, m: int, interpret: bool) -> Array:
    """Shift a flat (R, W*C) row block by ``m`` lanes (one pixel = C
    lanes), zero-filling the wrapped column. m > 0 pulls from lower w."""
    wm = x.shape[-1]
    if interpret:
        rolled = jnp.roll(x, m, axis=1)
    else:
        rolled = pltpu.roll(x, m % wm, axis=1)
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if m > 0:
        return jnp.where(ids >= m, rolled, 0.0)
    return jnp.where(ids < wm + m, rolled, 0.0)


def _dw3x3(x_ext: Array, taps_ref, bias_ref, m: int, rows: int, lead: int,
           interpret: bool) -> Array:
    """Depthwise 3x3 stride-1 on flat rows: output rows [lead, lead+rows)
    of the extended window ``x_ext`` (in window-row coordinates)."""
    xp = _roll(x_ext, m, interpret)    # kw=0 tap reads w-1
    xm = _roll(x_ext, -m, interpret)   # kw=2 tap reads w+1
    acc = jnp.broadcast_to(bias_ref[...], (rows, x_ext.shape[-1]))
    acc = acc.astype(jnp.float32)
    for kh in range(3):
        sl = slice(lead - 1 + kh, lead - 1 + kh + rows)
        acc = acc + xp[sl] * taps_ref[3 * kh + 0][None]
        acc = acc + x_ext[sl] * taps_ref[3 * kh + 1][None]
        acc = acc + xm[sl] * taps_ref[3 * kh + 2][None]
    return acc


def _pw(x: Array, bd_ref, bias_ref, bf16: bool = False) -> Array:
    """Pointwise conv as a block-diagonal MXU matmul on flat rows.

    ``bf16`` casts both operands to bfloat16 (fp32 accumulate): one MXU
    pass instead of three — the plain XLA path converts conv operands to
    bf16 under default precision too, so parity is unaffected."""
    r, wm = x.shape
    gin, gout = bd_ref.shape
    g = wm // gin
    lhs = x.reshape(r * g, gin)
    rhs = bd_ref[...]
    if bf16:
        lhs, rhs = lhs.astype(jnp.bfloat16), rhs.astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        lhs, rhs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.reshape(r, g * gout) + bias_ref[...]


def _se_gate(sums: Array, count: float, w1, b1, w2, b2, w: int, c: int,
             act: str, interpret: bool) -> Array:
    """SE gate from accumulated channel sums -> (1, W*C) tiled gate.

    ``SqueezeExcite`` semantics (backbones/efficientnet.py:101-116):
    global mean -> 1x1 reduce -> act -> 1x1 expand -> sigmoid. Mosaic
    only supports lane-width-multiple shape casts, so the per-channel
    fold is done with lane rolls on a (1, 128) partial-sum row instead of
    a (W, C) reshape; c must divide 128."""
    wm = sums.shape[-1]
    assert 128 % c == 0, c
    v = jnp.sum(sums.reshape(wm // 128, 128), axis=0, keepdims=True)
    acc = v
    for k in range(1, 128 // c):
        if interpret:
            acc = acc + jnp.roll(v, -c * k, axis=1)
        else:
            acc = acc + pltpu.roll(v, (128 - c * k) % 128, axis=1)
    mean = acc[:, :c] / count
    h = _act(jax.lax.dot_general(
        mean, w1[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1[...][None], act)
    g = jax.nn.sigmoid(jax.lax.dot_general(
        h, w2[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2[...][None])
    g128 = jnp.concatenate([g] * (128 // c), axis=1)
    return jnp.broadcast_to(g128, (wm // 128, 128)).reshape(1, wm)


def _row_mask(x: Array, r0, lead: int, h: int) -> Array:
    """Zero rows whose global index h' = r0 - lead + i falls outside
    [0, h): conv zero-padding at the image boundary (the stem of a zero
    image is the folded-BN bias, not zero, so masking is required)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    hh = r0 - lead + i
    return jnp.where((hh >= 0) & (hh < h), x, 0.0)


def fused_stage0_apply(img: Array, consts: dict, *, tile_rows: int = 16,
                       interpret: bool = False) -> Array:
    """Run stem + stage0 fused. img: (B, H, W, 3) fp32 NHWC; returns
    (B, H/2, W/2, c_out) fp32. ``consts`` from :func:`prepare_consts`."""
    b, h_img, w_img, _ = img.shape
    assert h_img % 2 == 0 and w_img % 32 == 0, img.shape
    h, w = h_img // 2, w_img // 2
    c_stem: int = consts["c_stem"]
    act: str = consts["act"]
    blocks: list[_BlockConsts] = consts["blocks"]
    assert len(blocks) in (1, 2)
    has_se = blocks[0].has_se
    two_blocks = len(blocks) == 2
    c_out = blocks[-1].cout
    wm0 = w * c_stem
    wm_out = w * c_out
    wm1 = w * blocks[1].cin if two_blocks else wm_out
    tr = tile_rows
    while h % tr:
        tr //= 2
    assert tr % 8 == 0, (h, tile_rows)  # DMA row slices must be 8-aligned
    nt = h // tr
    n_phase = 3 if has_se else 1
    assert not (two_blocks and not has_se), "2-block needs SE phases"

    # --- even/odd row+column packing of the image (one XLA pass) ---------
    # lanes per output pixel group: [even-col RGB, 0, odd-col RGB, 0]
    x = jnp.pad(img.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h_img, w, 8)
    ev = jnp.pad(x[:, 0::2], ((0, 0), (2, 6), (0, 0), (0, 0)))
    od = jnp.pad(x[:, 1::2], ((0, 0), (3, 5), (0, 0), (0, 0)))
    ev = ev.reshape(b, h + 8, w * 8)
    od = od.reshape(b, h + 8, w * 8)
    g8 = w * 8 // 128

    blk0 = blocks[0]
    blk1 = blocks[1] if two_blocks else blocks[0]

    def kernel(bd0_ref, bd1_ref, stem_bias_ref,
               t0_ref, db0_ref, sw1a, sb1a, sw2a, sb2a, bda_ref, pba_ref,
               t1_ref, db1_ref, sw1b, sb1b, sw2b, sb2b, bdb_ref, pbb_ref,
               ev_ref, od_ref, out_ref, y0_ref,
               ev_win, od_win, y0_win, y0_stage, o_win, zrow, sums0, sums1,
               g0, g1, sem):
        bi = pl.program_id(0)
        ph = pl.program_id(1)
        t = pl.program_id(2)
        r0 = t * tr

        def dma_in():
            c1 = pltpu.make_async_copy(
                ev_ref.at[bi, pl.ds(r0, tr + 8)], ev_win, sem.at[0])
            c2 = pltpu.make_async_copy(
                od_ref.at[bi, pl.ds(r0, tr + 8)], od_win, sem.at[1])
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()

        def stem_x():
            """x = relu6(bn(stem conv)) for ext rows [r0-2, r0+tr+2).

            Row sources per output row h': odd row h'-1 (kernel row 0),
            even row h' (row 1), odd row h' (row 2); column taps are the
            block-diag pairs bd0 (unshifted: even col = kw 1, odd = kw 2)
            and bd1 (shifted by one pixel group: odd col of w'-1 = kw 0).
            """
            rows = tr + 4
            acc = None
            mm_dt = jnp.float32 if interpret else jnp.bfloat16
            for kh, src in ((0, od_win[0:rows]), (1, ev_win[0:rows]),
                            (2, od_win[1:rows + 1])):
                s = _shift_flat(src, 8, interpret)
                y = jax.lax.dot_general(
                    src.reshape(rows * g8, 128).astype(mm_dt),
                    bd0_ref[...][kh].astype(mm_dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = y + jax.lax.dot_general(
                    s.reshape(rows * g8, 128).astype(mm_dt),
                    bd1_ref[...][kh].astype(mm_dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            xx = acc.reshape(rows, wm0) + stem_bias_ref[...]
            xx = jnp.clip(xx, 0.0, 6.0)  # stem act is ReLU6 (ref quirk)
            return _row_mask(xx, r0, 2, h)

        def block0_act(rows: int, lead: int) -> Array:
            """act(bn(dw0(x))) for ``rows`` x-window rows from ``lead``
            (window holds ext rows [r0-2, r0+tr+2))."""
            xx = stem_x()
            d = _dw3x3(xx, t0_ref, db0_ref, blk0.cin, rows, lead, interpret)
            return _act(d, act)

        def y0_ext_rows() -> Array:
            """Block-0 output for ext rows [r0-1, r0+tr+1)."""
            a = block0_act(tr + 2, 1)
            if blk0.has_se:
                a = a * g0[...]
            y = _pw(a, bda_ref, pba_ref, bf16=not interpret)
            return _row_mask(y, r0, 1, h)

        # ---- phase 0: accumulate block-0 SE channel sums -----------------
        @pl.when((ph == 0) if has_se else (ph < 0))
        def _():
            @pl.when(t == 0)
            def _():
                sums0[...] = jnp.zeros_like(sums0)
            dma_in()
            a = block0_act(tr, 2)
            sums0[...] += jnp.sum(a, axis=0, keepdims=True)

            @pl.when(t == nt - 1)
            def _():
                g0[...] = _se_gate(sums0[...], float(h * w), sw1a, sb1a,
                                   sw2a, sb2a, w, blk0.cin, act,
                                   interpret)

        # ---- phase 1 (or the only phase): emit y0 ------------------------
        @pl.when(ph == (1 if has_se else 0))
        def _():
            dma_in()
            y0e = y0_ext_rows()
            if not two_blocks:
                o_win[0:tr] = y0e[1:tr + 1]
                cp = pltpu.make_async_copy(
                    o_win.at[pl.ds(0, tr)],
                    out_ref.at[bi, pl.ds(r0, tr)], sem.at[2])
                cp.start()
                cp.wait()
            else:
                y0_stage[...] = y0e[1:tr + 1]
                cp = pltpu.make_async_copy(
                    y0_stage,
                    y0_ref.at[bi, pl.ds(r0 + 8, tr)], sem.at[2])
                cp.start()

                @pl.when(t == 0)
                def _():
                    sums1[...] = jnp.zeros_like(sums1)
                    zrow[...] = jnp.zeros_like(zrow)
                    cz1 = pltpu.make_async_copy(
                        zrow, y0_ref.at[bi, pl.ds(0, 8)], sem.at[3])
                    cz2 = pltpu.make_async_copy(
                        zrow, y0_ref.at[bi, pl.ds(h + 8, 8)], sem.at[4])
                    cz1.start()
                    cz2.start()
                    cz1.wait()
                    cz2.wait()

                d1 = _dw3x3(y0e, t1_ref, db1_ref, blk1.cin, tr, 1, interpret)
                a1 = _act(d1, act)
                sums1[...] += jnp.sum(a1, axis=0, keepdims=True)
                cp.wait()

                @pl.when(t == nt - 1)
                def _():
                    g1[...] = _se_gate(sums1[...], float(h * w), sw1b, sb1b,
                                       sw2b, sb2b, w, blk1.cin, act,
                                       interpret)

        # ---- phase 2: finish block 1 --------------------------------------
        if two_blocks:
            @pl.when(ph == 2)
            def _():
                cin_ = pltpu.make_async_copy(
                    y0_ref.at[bi, pl.ds(r0, tr + 16)], y0_win, sem.at[2])
                cin_.start()
                cin_.wait()
                y0w = y0_win[...]
                d1 = _dw3x3(y0w, t1_ref, db1_ref, blk1.cin, tr, 8, interpret)
                a1 = _act(d1, act)
                if blk1.has_se:
                    a1 = a1 * g1[...]
                y1 = _pw(a1, bdb_ref, pbb_ref, bf16=not interpret)
                if blk1.residual:
                    y1 = y1 + y0w[8:tr + 8]
                o_win[0:tr] = y1
                cp = pltpu.make_async_copy(
                    o_win.at[pl.ds(0, tr)],
                    out_ref.at[bi, pl.ds(r0, tr)], sem.at[3])
                cp.start()
                cp.wait()

    def blk_args(bc: _BlockConsts):
        return (bc.taps, bc.dw_bias, bc.se_w1, bc.se_b1, bc.se_w2, bc.se_b2,
                bc.pw_bd, bc.pw_bias)

    z = jnp.zeros((1, 128), jnp.float32)
    args = (consts["stem_bd0"], consts["stem_bd1"], consts["stem_bias"],
            *blk_args(blk0),
            *(blk_args(blocks[1]) if two_blocks else (z,) * 8),
            ev, od)

    out, _ = pl.pallas_call(
        kernel,
        grid=(b, n_phase, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 19
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wm_out), jnp.float32),
            jax.ShapeDtypeStruct((b, h + 16, wm1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + 8, w * 8), jnp.float32),     # ev_win
            pltpu.VMEM((tr + 8, w * 8), jnp.float32),     # od_win
            pltpu.VMEM((tr + 16, wm1), jnp.float32),      # y0_win
            pltpu.VMEM((tr, wm1), jnp.float32),           # y0_stage
            pltpu.VMEM((tr, wm_out), jnp.float32),        # o_win
            pltpu.VMEM((8, wm1), jnp.float32),            # zrow
            pltpu.VMEM((1, wm0), jnp.float32),            # sums0
            pltpu.VMEM((1, wm1), jnp.float32),            # sums1
            pltpu.VMEM((1, wm0), jnp.float32),            # g0
            pltpu.VMEM((1, wm1), jnp.float32),            # g1
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    return out.reshape(b, h, w, c_out)


def prepare_consts(params: dict, stats: dict, *, act: str,
                   width: int) -> dict:
    """Fold BN stats and tile/expand the stem + stage-0 weights into the
    kernel's constant layout. ``params``/``stats`` are the FeaturePyramid
    variable subtrees (conv_stem/bn1/blocks_0_*); ``width`` is the
    /2-resolution width W = W_img/2."""
    w = width

    def bn(p, s):
        return _fold_bn(p["scale"].astype(jnp.float32),
                        p["bias"].astype(jnp.float32),
                        s["mean"].astype(jnp.float32),
                        s["var"].astype(jnp.float32))

    # --- stem --------------------------------------------------------------
    k = params["conv_stem"]["Conv_0"]["kernel"].astype(jnp.float32)
    s, t = bn(params["bn1"], stats["bn1"])
    k = k * s[None, None, None]
    c_stem = k.shape[-1]
    px = 128 // 8
    bd0, bd1 = [], []
    for kh in range(3):
        w0 = jnp.zeros((8, c_stem), jnp.float32)
        w0 = w0.at[0:3].set(k[kh, 1]).at[4:7].set(k[kh, 2])
        w1 = jnp.zeros((8, c_stem), jnp.float32)
        w1 = w1.at[4:7].set(k[kh, 0])
        bd0.append(_block_diag(w0, px))
        bd1.append(_block_diag(w1, px))
    consts: dict[str, Any] = {
        "c_stem": int(c_stem),
        "act": act,
        "stem_bd0": jnp.stack(bd0),
        "stem_bd1": jnp.stack(bd1),
        "stem_bias": jnp.broadcast_to(t[None], (w, c_stem)).reshape(
            1, w * c_stem),
    }

    # --- stage-0 DS blocks ---------------------------------------------------
    blocks = []
    cin = int(c_stem)
    for bix in range(8):
        name = f"blocks_0_{bix}"
        if name not in params:
            break
        p, st = params[name], stats[name]
        dw = p["conv_dw"]["Conv_0"]["kernel"].astype(jnp.float32)[:, :, 0]
        s1, t1 = bn(p["bn1"], st["bn1"])
        taps = dw * s1[None, None]
        taps = jnp.broadcast_to(taps[:, :, None, :], (3, 3, w, cin))
        # zero boundary-pixel taps: the kernel's lane rolls wrap around the
        # row, so kw!=1 taps must vanish at the first/last pixel
        taps = taps.at[:, 0, 0, :].set(0.0).at[:, 2, w - 1, :].set(0.0)
        taps = taps.reshape(9, w * cin)
        dw_bias = jnp.broadcast_to(t1[None], (w, cin)).reshape(1, w * cin)
        has_se = "se" in p
        if has_se:
            se_w1 = p["se"]["conv_reduce"]["Conv_0"]["kernel"][0, 0]
            se_b1 = p["se"]["conv_reduce"]["Conv_0"]["bias"]
            se_w2 = p["se"]["conv_expand"]["Conv_0"]["kernel"][0, 0]
            se_b2 = p["se"]["conv_expand"]["Conv_0"]["bias"]
        else:
            se_w1 = jnp.zeros((cin, 1), jnp.float32)
            se_b1 = jnp.zeros((1,), jnp.float32)
            se_w2 = jnp.zeros((1, cin), jnp.float32)
            se_b2 = jnp.zeros((cin,), jnp.float32)
        pw = p["conv_pw"]["Conv_0"]["kernel"].astype(jnp.float32)[0, 0]
        s2, t2 = bn(p["bn2"], st["bn2"])
        pw = pw * s2[None]
        cout = int(pw.shape[-1])
        blocks.append(_BlockConsts(
            taps=taps, dw_bias=dw_bias,
            se_w1=jnp.asarray(se_w1, jnp.float32),
            se_b1=jnp.asarray(se_b1, jnp.float32),
            se_w2=jnp.asarray(se_w2, jnp.float32),
            se_b2=jnp.asarray(se_b2, jnp.float32),
            pw_bd=_block_diag(pw, _pw_px(cin, cout)),
            pw_bias=jnp.broadcast_to(t2[None], (w, cout)).reshape(
                1, w * cout),
            cin=cin, cout=cout, has_se=has_se, residual=cout == cin))
        cin = cout
    consts["blocks"] = blocks
    return consts
