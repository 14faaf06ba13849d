"""Fused Pallas kernel for whole backbone stages (IR/DS block chains).

Generalization of ``fused_head`` to the remaining EfficientNet/MobileNetV2
stages (reference: the timm ``blocks[1:]`` slices run by ``Feature``,
``/root/reference/models/ESMStereo.py:40-77``). Each stage is one
``pallas_call`` that keeps all intermediates in VMEM; HBM traffic is the
stage input (read once per phase), one round-trip per inter-block
activation, and the stage output — versus one full-tensor materialization
per conv/BN/act/SE op in the XLA lowering (measured: effb2 stage1 1.5 ms,
stage2 0.5 ms at 544x960 batch-2 on v5e; both HBM-bound).

Everything runs in the flat-lane layout of ``fused_head`` ((H, W*C) rows):

  * pointwise convs (IR expand / linear) = block-diagonal MXU matmuls,
  * stride-1 depthwise k3/k5 convs = k^2 shifted VPU FMAs,
  * stride-2 depthwise convs = tap-weighted accumulation on the *input*
    grid followed by ONE block-diagonal 0/1 decimation matmul
    (``kron(P, I_mid)`` with ``P[2i, i] = 1``) — structural-zero MACs
    ride the otherwise idle MXU,
  * the stride-2 entry block reads even/odd input-row planes (split
    outside in one XLA pass) like the fused head's stem,
  * SqueezeExcite global means: with SE (effb2) the grid runs nb+1
    phases — phase 0 accumulates block 0's channel sums, phase k emits
    block k-1 (gated) and accumulates block k's sums, phase nb emits the
    stage output. Without SE (mobilenetv2) the whole chain runs in ONE
    phase.

Row convention inside the kernel: every VMEM tensor is a "frame" of
``tr + 16`` rows where frame row j corresponds to output row
``r0 - 8 + j``. Each conv trusts a region that shrinks by its halo from
the frame edges; all final uses (SE sums, stores) read rows [8, 8+tr),
which stay inside the trusted region because cumulative halos are <= 8.
Row-validity masks (output row in [0, H_out)) are applied before every
activation so SE sums and stored edges are exact.

Constraints (checked by :func:`stage_supported`): every flat width
(W*cin, W*mid, W*cout) must be a multiple of 128 and W*mid a multiple of
lcm(mid, 128); stages that fail (effb2 stages 3-5 at deployment widths)
keep the plain XLA path. Eval-mode only (BN folded); exactness is covered
by tests/test_fused_stage.py.

MEASURED OUTCOME (v5e, 544x960 batch-2, fp32): the SE phase structure
LOSES for inverted-residual stages — effb2 stage1 runs 7.5 ms fused vs
1.5 ms plain. Each of the nb+1 phases recomputes the 6x-expanded mid
tensors (pwE + dw on the stride-2 input grid is ~50M elements x ~30 VPU
passes per phase), while XLA computes each op once and its 1.5 ms already
sits on the HBM roofline. Unlike the small-channel DS head (where lane
padding made XLA's traffic 8x the useful bytes), IR stages are
elementwise-work-bound: removing HBM traffic cannot beat the VPU floor.
The single-phase no-SE chain (MobileNetV2) also loses — XLA fuses those
cleanly already (mnv2 stage1 0.47 ms plain vs 1.55 ms fused; stage2
effectively free under XLA). A spill-mid-activations redesign would cap
recompute at 1x but only reach parity. Conclusion: Pallas fusion pays
only where XLA's layout padding inflates traffic well beyond useful
bytes (the 16-32 channel head); dense IR stages are best left to XLA.
NOT integrated into the model; kept as a tested building block with the
measurement record.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esmstereo_tpu.ops.pallas.fused_head import (
    _act,
    _block_diag,
    _fold_bn,
    _pw,
    _pw_px,
    _roll,
    _row_mask,
    _shift_flat,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class _StageBlock:
    """Static + trace-time constants for one block (BN folded)."""

    kind: str            # 'ir' | 'ds'
    k: int
    stride: int
    cin: int
    mid: int             # == cin for 'ds'
    cout: int
    has_se: bool
    residual: bool
    pwe_bd: Array        # (px*cin, px*mid) expand matmul ('ir'; zeros 'ds')
    pwe_bias: Array
    taps: Array          # (k*k, W_dw*mid) dw taps * bn scale, W_dw = grid
    dw_bias: Array       # (1, W_out*mid)
    dec_bd: Array        # stride2: (2*px*mid, px*mid) 0/1 decimation
    se_w1: Array
    se_b1: Array
    se_w2: Array
    se_b2: Array
    pwl_bd: Array        # (px*mid, px*cout)
    pwl_bias: Array      # (1, W_out*cout)


def _lcm(a: int, b: int) -> int:
    return a * b // math.gcd(a, b)


def _se_gate_any(sums: Array, count: float, w1, b1, w2, b2, c: int,
                 act: str, interpret: bool) -> Array:
    """SE gate for any channel count via lcm(c, 128)-lane folding."""
    wm = sums.shape[-1]
    ll = _lcm(c, 128)
    assert wm % ll == 0, (wm, c)
    v = jnp.sum(sums.reshape(wm // ll, ll), axis=0, keepdims=True)
    acc = v
    for kk in range(1, ll // c):
        if interpret:
            acc = acc + jnp.roll(v, -c * kk, axis=1)
        else:
            acc = acc + pltpu.roll(v, (ll - c * kk) % ll, axis=1)
    mean = acc[:, :c] / count
    h = _act(jax.lax.dot_general(
        mean, w1[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1[...][None], act)
    g = jax.nn.sigmoid(jax.lax.dot_general(
        h, w2[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2[...][None])
    gl = jnp.concatenate([g] * (ll // c), axis=1)
    return jnp.broadcast_to(gl, (wm // ll, ll)).reshape(1, wm)


def _dw_flat_frame(x: Array, taps_ref, m: int, k: int,
                   interpret: bool) -> Array:
    """Stride-1 depthwise kxk on a full frame; output frame row j is valid
    where input rows [j-o, j+o] were valid (edge rows zero-filled)."""
    o = k // 2
    n = x.shape[0]
    shifted = {0: x}
    for d in range(1, o + 1):
        shifted[d] = _roll(x, d * m, interpret)
        shifted[-d] = _roll(x, -d * m, interpret)
    core = None
    for kh in range(k):
        for kw in range(k):
            term = shifted[o - kw][kh:kh + n - 2 * o] * \
                taps_ref[k * kh + kw][None]
            core = term if core is None else core + term
    return jnp.pad(core, ((o, o), (0, 0)))


def stage_supported(stage: Sequence, cin: int, w_in: int, h_in: int) -> bool:
    """Shapes the kernel handles without channel padding."""
    s2 = stage[0].stride == 2
    if (s2 and (h_in % 2 or w_in % 2)) or w_in <= 0:
        return False
    w = w_in // 2 if s2 else w_in
    c = cin
    for i, b in enumerate(stage):
        if b.kind not in ("ds", "ir") or b.kernel not in (3, 5):
            return False
        if b.stride == 2 and i > 0:
            return False
        mid = c * b.expand if b.kind == "ir" else c
        w_dw = w_in if (i == 0 and s2) else w
        w_in_blk = w_in if (i == 0 and s2) else w
        for ww, cc in ((w_in_blk, c), (w_dw, mid), (w, mid), (w, b.out_chs)):
            if (ww * cc) % 128:
                return False
        if b.se_ratio > 0 and (w * mid) % _lcm(mid, 128):
            return False
        c = b.out_chs
    return True


def prepare_stage_consts(params: dict, stats: dict, *, si: int,
                         stage: Sequence, cin: int, w_out: int,
                         act: str) -> dict:
    """Fold BN and expand weights for one stage. ``stage`` is the tuple of
    BlockCfg; ``w_out`` the stage's output width."""
    w = w_out

    def bn(p, s):
        return _fold_bn(p["scale"].astype(jnp.float32),
                        p["bias"].astype(jnp.float32),
                        s["mean"].astype(jnp.float32),
                        s["var"].astype(jnp.float32))

    blocks = []
    c = cin
    for bix, bcfg in enumerate(stage):
        p = params[f"blocks_{si}_{bix}"]
        st = stats[f"blocks_{si}_{bix}"]
        kk = bcfg.kernel
        s2 = bcfg.stride == 2
        w_dw = 2 * w if s2 else w
        z = jnp.zeros((1, 128), jnp.float32)
        if bcfg.kind == "ir":
            mid = c * bcfg.expand
            ke = p["conv_pw"]["Conv_0"]["kernel"].astype(jnp.float32)[0, 0]
            s1, t1 = bn(p["bn1"], st["bn1"])
            ke = ke * s1[None]
            pwe_bd = _block_diag(ke, _pw_px(c, mid))
            pwe_bias = jnp.broadcast_to(t1[None], (w_dw, mid)).reshape(
                1, w_dw * mid)
            dw_name, bn_dw, bn_l = "conv_dw", "bn2", "bn3"
            kl = p["conv_pwl"]["Conv_0"]["kernel"].astype(jnp.float32)[0, 0]
        else:
            mid = c
            pwe_bd, pwe_bias = z, z
            dw_name, bn_dw, bn_l = "conv_dw", "bn1", "bn2"
            kl = p["conv_pw"]["Conv_0"]["kernel"].astype(jnp.float32)[0, 0]
        dw = p[dw_name]["Conv_0"]["kernel"].astype(jnp.float32)[:, :, 0]
        s2_, t2_ = bn(p[bn_dw], st[bn_dw])
        taps = dw * s2_[None, None]
        taps = jnp.broadcast_to(taps[:, :, None, :], (kk, kk, w_dw, mid))
        # zero boundary-pixel taps: the kernel's lane rolls wrap around the
        # row, so off-center column taps must vanish at the edges
        o_ = kk // 2
        for kw in range(kk):
            if kw < o_:
                taps = taps.at[:, kw, 0:o_ - kw, :].set(0.0)
            elif kw > o_:
                taps = taps.at[:, kw, w_dw - (kw - o_):, :].set(0.0)
        taps = taps.reshape(kk * kk, w_dw * mid)
        dw_bias = jnp.broadcast_to(t2_[None], (w, mid)).reshape(1, w * mid)
        if s2:
            pxo = 128 // math.gcd(mid, 128)
            sel = np.zeros((2 * pxo, pxo), np.float32)
            sel[0::2, :] = np.eye(pxo, dtype=np.float32)
            dec = jnp.asarray(np.kron(sel, np.eye(mid, dtype=np.float32)))
        else:
            dec = z
        if bcfg.se_ratio > 0:
            se_w1 = p["se"]["conv_reduce"]["Conv_0"]["kernel"][0, 0]
            se_b1 = p["se"]["conv_reduce"]["Conv_0"]["bias"]
            se_w2 = p["se"]["conv_expand"]["Conv_0"]["kernel"][0, 0]
            se_b2 = p["se"]["conv_expand"]["Conv_0"]["bias"]
        else:
            se_w1, se_b1, se_w2, se_b2 = z, z[0], z, z[0]
        sl, tl = bn(p[bn_l], st[bn_l])
        kl = kl * sl[None]
        cout = int(kl.shape[-1])
        blocks.append(_StageBlock(
            kind=bcfg.kind, k=kk, stride=bcfg.stride, cin=c, mid=mid,
            cout=cout, has_se=bcfg.se_ratio > 0,
            residual=bcfg.stride == 1 and c == cout,
            pwe_bd=pwe_bd, pwe_bias=pwe_bias, taps=taps, dw_bias=dw_bias,
            dec_bd=dec,
            se_w1=jnp.asarray(se_w1, jnp.float32),
            se_b1=jnp.asarray(se_b1, jnp.float32),
            se_w2=jnp.asarray(se_w2, jnp.float32),
            se_b2=jnp.asarray(se_b2, jnp.float32),
            pwl_bd=_block_diag(kl, _pw_px(mid, cout)),
            pwl_bias=jnp.broadcast_to(tl[None], (w, cout)).reshape(
                1, w * cout)))
        c = cout
    return {"blocks": blocks, "act": act}


_N_PER_BLK = 11


def fused_stage_apply(x: Array, consts: dict, *, tile_rows: int = 16,
                      interpret: bool = False) -> Array:
    """Run one fused stage. x: (B, H, W, cin) fp32 NHWC at the stage's
    input resolution; returns (B, H_out, W_out, cout) fp32."""
    blocks: list[_StageBlock] = consts["blocks"]
    act: str = consts["act"]
    nb = len(blocks)
    s2 = blocks[0].stride == 2
    bsz, h_in, w_in, cin = x.shape
    h = h_in // 2 if s2 else h_in
    w = w_in // 2 if s2 else w_in
    has_se = any(bl.has_se for bl in blocks)
    assert all(bl.has_se == has_se for bl in blocks), "mixed SE unsupported"

    tr = tile_rows
    nt = -(-h // tr)
    hp = nt * tr
    frame = tr + 16

    xf = x.astype(jnp.float32)
    wm_in = w_in * cin
    if s2:
        ev = xf[:, 0::2].reshape(bsz, h_in // 2, wm_in)
        od = xf[:, 1::2].reshape(bsz, h_in // 2, wm_in)
        ev = jnp.pad(ev, ((0, 0), (8, hp + 8 - ev.shape[1]), (0, 0)))
        od = jnp.pad(od, ((0, 0), (8, hp + 8 - od.shape[1]), (0, 0)))
        ins = (ev, od)
    else:
        xi = xf.reshape(bsz, h_in, wm_in)
        xi = jnp.pad(xi, ((0, 0), (8, hp + 16 - 8 - h_in, ), (0, 0)))
        ins = (xi, xi)

    wm_mid = [w * bl.mid for bl in blocks]
    wm_out = [w * bl.cout for bl in blocks]
    wm_win = max([wm_in] + wm_out)
    n_phase = nb + 1 if has_se else 1

    def blk_args(bl: _StageBlock):
        return (bl.pwe_bd, bl.pwe_bias, bl.taps, bl.dw_bias, bl.dec_bd,
                bl.se_w1, bl.se_b1, bl.se_w2, bl.se_b2, bl.pwl_bd,
                bl.pwl_bias)

    def kernel(*refs):
        blk = [refs[i * _N_PER_BLK:(i + 1) * _N_PER_BLK] for i in range(nb)]
        a_ref, b_ref = refs[nb * _N_PER_BLK], refs[nb * _N_PER_BLK + 1]
        outs = refs[nb * _N_PER_BLK + 2: nb * _N_PER_BLK + 2 + nb]
        scr = refs[nb * _N_PER_BLK + 2 + nb:]
        win_a, win_b, stage_w, zrow = scr[0], scr[1], scr[2], scr[3]
        sums = scr[4:4 + nb]
        gates = scr[4 + nb:4 + 2 * nb]
        sem = scr[-1]

        bi = pl.program_id(0)
        ph = pl.program_id(1)
        t = pl.program_id(2)
        r0 = t * tr

        def dma_in():
            c1 = pltpu.make_async_copy(
                a_ref.at[bi, pl.ds(r0, frame)],
                win_a.at[:, pl.ds(0, wm_in)], sem.at[0])
            c1.start()
            if s2:
                c2 = pltpu.make_async_copy(
                    b_ref.at[bi, pl.ds(r0, frame)], win_b, sem.at[1])
                c2.start()
                c2.wait()
            c1.wait()

        def dma_y(src_ref, wm):
            c1 = pltpu.make_async_copy(
                src_ref.at[bi, pl.ds(r0, frame)],
                win_a.at[:, pl.ds(0, wm)], sem.at[0])
            c1.start()
            c1.wait()

        def mask(arr):
            # zero rows whose output index r0 - 8 + j is outside [0, h)
            return _row_mask(arr, r0, 8, h)

        def entry_mid() -> Array:
            """Block-0 mid acts as a full frame (trusted rows [1+?, ...))."""
            bl, blc = blk[0], blocks[0]
            if not s2:
                src = win_a[:, 0:wm_in]
                if blc.kind == "ir":
                    src = _act(_pw(src, bl[0], bl[1], bf16=not interpret),
                               act)
                y = _dw_flat_frame(src, bl[2], blc.mid, blc.k, interpret)
                return _act(mask(y + bl[3][...]), act)
            # stride-2: tap-weighted accumulation on the input grid, then
            # one decimation matmul. Out row h' <- input rows 2h' + d,
            # d in [-o, o]; even d -> ev plane row h' + d//2, odd -> od.
            if blc.kind == "ir":
                pe = _act(_pw(win_a[:, 0:wm_in], bl[0], bl[1],
                              bf16=not interpret), act)
                po = _act(_pw(win_b[...], bl[0], bl[1],
                              bf16=not interpret), act)
            else:
                pe, po = win_a[:, 0:wm_in], win_b[...]
            k, o, mid = blc.k, blc.k // 2, blc.mid
            n = frame - 2
            u = None
            for kh in range(k):
                d = kh - o
                src = pe if d % 2 == 0 else po
                off = d // 2  # python floor: works for odd negatives
                rows = src[1 + off:1 + off + n]
                for kw in range(k):
                    term = (rows if kw == o else
                            _roll(rows, (o - kw) * mid, interpret))
                    term = term * bl[2][k * kh + kw][None]
                    u = term if u is None else u + term
            y = _dec2(u, bl[4], bl[3])
            y = jnp.pad(y, ((1, 1), (0, 0)))
            return _act(mask(y), act)

        def _dec2(u, dec_ref, bias_ref):
            # 0/1 selection matrix is exact in bf16; the operand cast
            # matches XLA's default conv precision
            r, wmu = u.shape
            gin, gout = dec_ref.shape
            g = wmu // gin
            lhs = u.reshape(r * g, gin)
            rhs = dec_ref[...]
            if not interpret:
                lhs = lhs.astype(jnp.bfloat16)
                rhs = rhs.astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                lhs, rhs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y.reshape(r, g * gout) + bias_ref[...]

        def mid_acts(i: int, src: Array) -> Array:
            """Block i>0 mid acts from its full-frame input."""
            bl, blc = blk[i], blocks[i]
            if blc.kind == "ir":
                src = _act(_pw(src, bl[0], bl[1], bf16=not interpret), act)
            y = _dw_flat_frame(src, bl[2], blc.mid, blc.k, interpret)
            return _act(mask(y + bl[3][...]), act)

        def block_out(i: int, mid: Array, src: Array | None) -> Array:
            """Finish block i (gate, linear pw, residual) -> full frame."""
            bl, blc = blk[i], blocks[i]
            if blc.has_se:
                mid = mid * gates[i][...]
            y = _pw(mid, bl[9], bl[10], bf16=not interpret)
            if blc.residual and src is not None:
                y = y + src
            return mask(y)

        def finalize_gate(i: int):
            gates[i][...] = _se_gate_any(
                sums[i][...], float(h * w), blk[i][5], blk[i][6],
                blk[i][7], blk[i][8], blocks[i].mid, act, interpret)

        def store(out_ref, y_frame, wm, *, zero_edges):
            stage_w[:, 0:wm] = y_frame[8:8 + tr]

            @pl.when(t == 0)
            def _():
                if zero_edges:
                    zrow[...] = jnp.zeros_like(zrow)
                    cz1 = pltpu.make_async_copy(
                        zrow.at[:, pl.ds(0, wm)],
                        out_ref.at[bi, pl.ds(0, 8)], sem.at[2])
                    cz2 = pltpu.make_async_copy(
                        zrow.at[:, pl.ds(0, wm)],
                        out_ref.at[bi, pl.ds(hp + 8, 8)], sem.at[3])
                    cz1.start()
                    cz2.start()
                    cz1.wait()
                    cz2.wait()

            cp = pltpu.make_async_copy(
                stage_w.at[:, pl.ds(0, wm)],
                out_ref.at[bi, pl.ds(r0 + 8, tr)], sem.at[4])
            cp.start()
            cp.wait()

        if has_se:
            @pl.when(ph == 0)
            def _():
                @pl.when(t == 0)
                def _():
                    sums[0][...] = jnp.zeros_like(sums[0])
                dma_in()
                a = entry_mid()
                sums[0][...] += jnp.sum(a[8:8 + tr], axis=0, keepdims=True)

                @pl.when(t == nt - 1)
                def _():
                    finalize_gate(0)

            for k_ in range(1, nb):
                @pl.when(ph == k_)
                def _(k_=k_):
                    @pl.when(t == 0)
                    def _(k_=k_):
                        sums[k_][...] = jnp.zeros_like(sums[k_])
                    if k_ == 1:
                        dma_in()
                        a = entry_mid()
                        src = None if s2 else win_a[:, 0:wm_in]
                    else:
                        dma_y(outs[k_ - 2], wm_out[k_ - 2])
                        src = win_a[:, 0:wm_out[k_ - 2]]
                        a = mid_acts(k_ - 1, src)
                    y = block_out(k_ - 1, a, src)
                    store(outs[k_ - 1], y, wm_out[k_ - 1], zero_edges=True)
                    a2 = mid_acts(k_, y)
                    sums[k_][...] += jnp.sum(a2[8:8 + tr], axis=0,
                                             keepdims=True)

                    @pl.when(t == nt - 1)
                    def _(k_=k_):
                        finalize_gate(k_)

            @pl.when(ph == nb)
            def _():
                if nb == 1:
                    dma_in()
                    a = entry_mid()
                    src = None if s2 else win_a[:, 0:wm_in]
                else:
                    dma_y(outs[nb - 2], wm_out[nb - 2])
                    src = win_a[:, 0:wm_out[nb - 2]]
                    a = mid_acts(nb - 1, src)
                y = block_out(nb - 1, a, src)
                store(outs[nb - 1], y, wm_out[nb - 1], zero_edges=False)
        else:
            @pl.when(ph == 0)
            def _():
                dma_in()
                a = entry_mid()
                y = block_out(0, a, None if s2 else win_a[:, 0:wm_in])
                for i in range(1, nb):
                    a = mid_acts(i, y)
                    y = block_out(i, a, y)
                store(outs[nb - 1], y, wm_out[nb - 1], zero_edges=False)

    args = []
    for bl in blocks:
        args.extend(blk_args(bl))
    args.extend(ins)

    outs = pl.pallas_call(
        kernel,
        grid=(bsz, n_phase, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (nb * _N_PER_BLK)
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.ANY)
                        for _ in range(nb)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((bsz, hp + 16, wm_out[i]), jnp.float32)
            for i in range(nb)),
        scratch_shapes=[
            pltpu.VMEM((frame, wm_win), jnp.float32),              # win_a
            pltpu.VMEM((frame, wm_in if s2 else 128), jnp.float32),
            pltpu.VMEM((tr, wm_win), jnp.float32),                 # stage_w
            pltpu.VMEM((8, max(wm_out)), jnp.float32),             # zrow
        ]
        + [pltpu.VMEM((1, wm_mid[i]), jnp.float32) for i in range(nb)]
        + [pltpu.VMEM((1, wm_mid[i]), jnp.float32) for i in range(nb)]
        + [pltpu.SemaphoreType.DMA((5,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    y = outs[-1][:, 8:8 + h]
    return y.reshape(bsz, h, w, blocks[-1].cout)
