"""Fused Pallas kernel for the stem_2 + stem_4 matching towers.

Counterpart of the reference ``stem_2``/``stem_4`` sequentials
(``/root/reference/models/ESMStereo.py:529-583``): two StemBlocks, each
``conv3x3 stride2 -> BN -> GELU`` then ``conv3x3 -> BN -> ReLU``
(nn/blocks.py:277-294). Like the backbone head, this section is
small-channel (3 -> 32 -> 48) at half/quarter resolution, so the XLA
lowering is HBM-bound lane-padded traffic: measured 2.2-2.5 ms of the
frame at 544x960 batch-2 on v5e.

One single-phase kernel (no SqueezeExcite -> no global coupling) chains
all four convs in VMEM per row-tile of the 1/4 grid:

  * the image is pre-split (one XLA pass) into FOUR row-parity planes
    with even/odd column pairs packed into lanes, so both stride-2 convs
    become plain block-diagonal matmuls over aligned rows — no strided
    sublane access anywhere,
  * stem_2 is computed as separate even-row / odd-row frames indexed by
    the 1/4 grid; its two outputs are written as one row-interleaved
    buffer (lane-concatenated pairs) that a free XLA reshape turns back
    into the (B, H/2, W/2, 32) tensor,
  * dense 3x3 convs are 9 shifted block-diagonal ``kron(I_px, K[kh,kw])``
    MXU matmuls; the stride-2 stem_4 entry folds its column taps into
    block matrices like fused_stage's decimation,
  * all matmul operands are cast to bf16 (fp32 accumulate), matching
    XLA's default conv precision on the plain path,
  * eval-mode BatchNorms are folded into biases/weights.

Eval-mode only; exactness vs the plain StemBlocks is covered by
tests/test_fused_stems.py.

MEASURED OUTCOME (v5e, 544x960 batch-2, fp32): LOSES — 2.82 ms fused vs
2.12 ms plain. Unlike the backbone head (depthwise convs = idle MXU, the
win came from elementwise lane waste), the stems are four REAL dense 3x3
convs: the block-diagonal matmul formulation pays a structural 4-8x MAC
waste that XLA's native im2col convs do not, and there is little
elementwise traffic to reclaim. Kept as a tested building block
(``ESMStereoConfig.fuse_stems``, default False).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esmstereo_tpu.ops.pallas.fused_head import (
    _block_diag,
    _fold_bn,
    _row_mask,
    _shift_flat,
)

Array = jax.Array


def _gelu(x: Array, interpret: bool) -> Array:
    """GELU honoring the global numerics switch (nn.blocks.set_gelu_approximate),
    so a fast-GELU deployment graph stays consistent across the fused and
    plain sections. Exact mode compiles via the A&S rational erf — see
    ops.pallas.activations."""
    from esmstereo_tpu.nn import blocks as _blocks
    from esmstereo_tpu.ops.pallas.activations import gelu
    return gelu(x, approximate=_blocks.GELU_APPROXIMATE,
                interpret=interpret)


def _mm(lhs: Array, rhs: Array, bf16: bool) -> Array:
    if bf16:
        lhs, rhs = lhs.astype(jnp.bfloat16), rhs.astype(jnp.bfloat16)
    return jax.lax.dot_general(lhs, rhs, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def prepare_stems_consts(params: dict, stats: dict, *, w_img: int,
                         f2: int = 32, f4: int = 48) -> dict:
    """Fold BN and expand the two StemBlocks' weights.

    ``params``/``stats`` hold the ``stem_2``/``stem_4`` subtrees; layout
    per StemBlock: conv_down/conv/Conv_0/kernel + conv_down/bn,
    conv/Conv_0/kernel + bn (nn/blocks.py:277-294)."""
    w2, w4 = w_img // 2, w_img // 4

    def bn(p, s):
        return _fold_bn(p["scale"].astype(jnp.float32),
                        p["bias"].astype(jnp.float32),
                        s["mean"].astype(jnp.float32),
                        s["var"].astype(jnp.float32))

    c: dict[str, Any] = {"f2": f2, "f4": f4}

    # --- stem_2 conv_down: 3x3 s2, 3 -> f2, from eo-col packed planes ----
    p2 = params["stem_2"]
    s2t = stats["stem_2"]
    k = p2["conv_down"]["conv"]["Conv_0"]["kernel"].astype(jnp.float32)
    sc, t = bn(p2["conv_down"]["bn"], s2t["conv_down"]["bn"])
    k = k * sc[None, None, None]
    px = 128 // 8
    bd0, bd1 = [], []
    for kh in range(3):
        w0 = jnp.zeros((8, f2), jnp.float32)
        w0 = w0.at[0:3].set(k[kh, 1]).at[4:7].set(k[kh, 2])
        w1 = jnp.zeros((8, f2), jnp.float32)
        w1 = w1.at[4:7].set(k[kh, 0])
        bd0.append(_block_diag(w0, px))
        bd1.append(_block_diag(w1, px))
    c["s2d_bd0"] = jnp.stack(bd0)
    c["s2d_bd1"] = jnp.stack(bd1)
    c["s2d_bias"] = jnp.broadcast_to(t[None], (w2, f2)).reshape(1, w2 * f2)

    # --- stem_2 conv: dense 3x3 s1, f2 -> f2 ------------------------------
    k = p2["conv"]["Conv_0"]["kernel"].astype(jnp.float32)
    sc, t = bn(p2["bn"], s2t["bn"])
    k = k * sc[None, None, None]
    px2 = 128 // np.gcd(f2, 128)
    c["s2c_bd"] = jnp.stack([_block_diag(k[kh, kw], px2)
                             for kh in range(3) for kw in range(3)])
    c["s2c_bias"] = jnp.broadcast_to(t[None], (w2, f2)).reshape(1, w2 * f2)

    # --- stem_4 conv_down: 3x3 s2, f2 -> f4 -------------------------------
    # column taps folded into block matrices over (2*pxo) input pixels:
    # out px i reads in px 2i + kw - 1; the kw=0 term at i=0 comes from the
    # +1-pixel-shifted operand (D_1).
    p4 = params["stem_4"]
    s4t = stats["stem_4"]
    k = p4["conv_down"]["conv"]["Conv_0"]["kernel"].astype(jnp.float32)
    sc, t = bn(p4["conv_down"]["bn"], s4t["conv_down"]["bn"])
    k = k * sc[None, None, None]
    pxo = 128 // np.gcd(f4, 128)
    d0 = jnp.zeros((3, 2 * pxo * f2, pxo * f4), jnp.float32)
    d1 = jnp.zeros((3, 2 * pxo * f2, pxo * f4), jnp.float32)
    for kh in range(3):
        for i in range(pxo):
            for kw in range(3):
                j = 2 * i + kw - 1
                if 0 <= j < 2 * pxo:
                    d0 = d0.at[kh, j * f2:(j + 1) * f2,
                               i * f4:(i + 1) * f4].add(k[kh, kw])
                else:  # j == -1: shifted operand has it at position 0
                    d1 = d1.at[kh, (j + 1) * f2:(j + 2) * f2,
                               i * f4:(i + 1) * f4].add(k[kh, kw])
    c["s4d_d0"] = d0
    c["s4d_d1"] = d1
    c["s4d_bias"] = jnp.broadcast_to(t[None], (w4, f4)).reshape(1, w4 * f4)

    # --- stem_4 conv: dense 3x3 s1, f4 -> f4 ------------------------------
    k = p4["conv"]["Conv_0"]["kernel"].astype(jnp.float32)
    sc, t = bn(p4["bn"], s4t["bn"])
    k = k * sc[None, None, None]
    px4 = 128 // np.gcd(f4, 128)
    c["s4c_bd"] = jnp.stack([_block_diag(k[kh, kw], px4)
                             for kh in range(3) for kw in range(3)])
    c["s4c_bias"] = jnp.broadcast_to(t[None], (w4, f4)).reshape(1, w4 * f4)
    return c


def stems_supported(h_img: int, w_img: int, f2: int = 32,
                    f4: int = 48) -> bool:
    if h_img % 16 or w_img % 32 or f2 % 8 or f4 % 8:
        return False
    w2, w4 = w_img // 2, w_img // 4
    px2 = 128 // np.gcd(f2, 128)
    pxo = 128 // np.gcd(f4, 128)
    return ((w2 * f2) % 128 == 0 and (w4 * f4) % 128 == 0
            and w2 % px2 == 0          # dense stem_2 conv groups
            and w2 % (2 * pxo) == 0    # stride-2 stem_4 input groups
            and w4 % pxo == 0)         # dense stem_4 conv groups


def fused_stems_apply(img: Array, consts: dict, *, tile_rows: int = 16,
                      interpret: bool = False) -> tuple[Array, Array]:
    """Run stem_2 + stem_4 fused. img: (B, H, W, 3) fp32 NHWC; returns
    (stem_2 out (B, H/2, W/2, f2), stem_4 out (B, H/4, W/4, f4))."""
    b, h_img, w_img, _ = img.shape
    f2: int = consts["f2"]
    f4: int = consts["f4"]
    assert stems_supported(h_img, w_img, f2, f4), (img.shape, f2, f4)
    h2, w2 = h_img // 2, w_img // 2
    h4, w4 = h_img // 4, w_img // 4
    wm2, wm4 = w2 * f2, w4 * f4
    bf = not interpret

    tr = tile_rows
    if h4 % tr and h4 % 8 == 0:
        tr = 8
    assert tr % 8 == 0, (h4, tile_rows)
    nt = -(-h4 // tr)
    hp = nt * tr
    frame = tr + 16

    # four row-parity planes, eo-col packed ([even RGB, 0, odd RGB, 0])
    x = jnp.pad(img.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h_img, w2, 8)
    planes = []
    for r in range(4):
        pr = x[:, r::4].reshape(b, h4, w2 * 8)
        planes.append(jnp.pad(pr, ((0, 0), (8, hp + 8 - h4), (0, 0))))
    g8 = w2 * 8 // 128

    def kernel(bd0_ref, bd1_ref, s2d_bias, s2c_bd, s2c_bias,
               s4d_d0, s4d_d1, s4d_bias, s4c_bd, s4c_bias,
               p0_ref, p1_ref, p2_ref, p3_ref,
               out2_ref, out4_ref,
               w0, w1, w2_, w3, o2_w, o4_w, sem):
        bi = pl.program_id(0)
        t = pl.program_id(1)
        r0 = t * tr

        cps = []
        for i, (pref, wref) in enumerate(((p0_ref, w0), (p1_ref, w1),
                                          (p2_ref, w2_), (p3_ref, w3))):
            cp = pltpu.make_async_copy(
                pref.at[bi, pl.ds(r0, frame)], wref, sem.at[i])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

        def s2_down(srcs) -> Array:
            """stem_2 conv_down for one row parity: 3 (row source, kh)
            pairs of eo-col block matmuls + bias + GELU."""
            acc = None
            for kh, src in enumerate(srcs):
                s = _shift_flat(src, 8, interpret)
                y = _mm(src.reshape(frame * g8, 128), bd0_ref[kh], bf)
                y = y + _mm(s.reshape(frame * g8, 128), bd1_ref[kh], bf)
                acc = y if acc is None else acc + y
            return acc.reshape(frame, wm2) + s2d_bias[...]

        # even stem_2 rows 2j' <- img rows 4j'-1, 4j', 4j'+1
        a_ev = s2_down((jnp.pad(w3[0:frame - 1], ((1, 0), (0, 0))),
                        w0[...], w1[...]))
        # odd rows 2j'+1 <- img rows 4j'+1, 4j'+2, 4j'+3
        a_od = s2_down((w1[...], w2_[...], w3[...]))
        # validity masks on the 1/2-grid row index (2h' and 2h'+1 < h2
        # reduce to h' < h4, same mask) + GELU
        a_ev = _gelu(_row_mask(a_ev, r0, 8, h4), interpret)
        a_od = _gelu(_row_mask(a_od, r0, 8, h4), interpret)

        def dense3(x_c, x_u, x_d, bds, bias, m, px_g):
            """Dense 3x3: rows (up, center, down) frames + 9 block
            matmuls with column shifts +-m."""
            acc = None
            for kh, src in enumerate((x_u, x_c, x_d)):
                xs = {0: src, 1: _shift_flat(src, m, interpret),
                      -1: _shift_flat(src, -m, interpret)}
                for kw in range(3):
                    g = src.shape[-1] // px_g
                    y = _mm(xs[1 - kw].reshape(frame * g, px_g),
                            bds[3 * kh + kw], bf)
                    acc = y if acc is None else acc + y
            return acc.reshape(frame, x_c.shape[-1] * bds.shape[-1]
                               // px_g) + bias[...]

        # stem_2 conv (dense, f2->f2): even rows read odd neighbours and
        # vice versa; a_od[j-1] supplies the row above an even row.
        a_od_up = jnp.pad(a_od[0:frame - 1], ((1, 0), (0, 0)))
        a_ev_dn = jnp.pad(a_ev[1:frame], ((0, 1), (0, 0)))
        b_ev = dense3(a_ev, a_od_up, a_od, s2c_bd, s2c_bias, f2, 128)
        b_od = dense3(a_od, a_ev, a_ev_dn, s2c_bd, s2c_bias, f2, 128)
        b_ev = jax.nn.relu(_row_mask(b_ev, r0, 8, h4))
        b_od = jax.nn.relu(_row_mask(b_od, r0, 8, h4))

        # stem_2 output: row-interleaved pairs [even | odd] on lanes
        o2_w[:, 0:wm2] = b_ev[8:8 + tr]
        o2_w[:, wm2:2 * wm2] = b_od[8:8 + tr]
        cp2 = pltpu.make_async_copy(
            o2_w, out2_ref.at[bi, pl.ds(r0, tr)], sem.at[4])
        cp2.start()

        # stem_4 conv_down: out row h' reads stem_2 rows 2h'-1, 2h', 2h'+1
        # = b_od[h'-1], b_ev[h'], b_od[h']
        b_od_up = jnp.pad(b_od[0:frame - 1], ((1, 0), (0, 0)))
        acc = None
        gin = s4d_d0.shape[-2]
        for kh, src in enumerate((b_od_up, b_ev, b_od)):
            sp = _shift_flat(src, f2, interpret)
            g = wm2 // gin
            y = _mm(src.reshape(frame * g, gin), s4d_d0[kh], bf)
            y = y + _mm(sp.reshape(frame * g, gin), s4d_d1[kh], bf)
            acc = y if acc is None else acc + y
        cc = _gelu(_row_mask(acc.reshape(frame, wm4) + s4d_bias[...],
                             r0, 8, h4), interpret)

        # stem_4 conv (dense, f4->f4) on the 1/4 grid
        c_up = jnp.pad(cc[0:frame - 1], ((1, 0), (0, 0)))
        c_dn = jnp.pad(cc[1:frame], ((0, 1), (0, 0)))
        d = dense3(cc, c_up, c_dn, s4c_bd, s4c_bias, f4, 384)
        d = jax.nn.relu(_row_mask(d, r0, 8, h4))

        o4_w[...] = d[8:8 + tr]
        cp4 = pltpu.make_async_copy(
            o4_w, out4_ref.at[bi, pl.ds(r0, tr)], sem.at[5])
        cp4.start()
        cp4.wait()
        cp2.wait()

    out2, out4 = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        out_shape=(
            jax.ShapeDtypeStruct((b, hp, 2 * wm2), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, wm4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((frame, w2 * 8), jnp.float32),   # w0..w3
            pltpu.VMEM((frame, w2 * 8), jnp.float32),
            pltpu.VMEM((frame, w2 * 8), jnp.float32),
            pltpu.VMEM((frame, w2 * 8), jnp.float32),
            pltpu.VMEM((tr, 2 * wm2), jnp.float32),     # o2_w
            pltpu.VMEM((tr, wm4), jnp.float32),         # o4_w
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(consts["s2d_bd0"], consts["s2d_bd1"], consts["s2d_bias"],
      consts["s2c_bd"], consts["s2c_bias"], consts["s4d_d0"],
      consts["s4d_d1"], consts["s4d_bias"], consts["s4c_bd"],
      consts["s4c_bias"], *planes)

    s2out = out2[:, :h4].reshape(b, h2, w2, f2)
    s4out = out4[:, :h4].reshape(b, h4, w4, f4)
    return s2out, s4out
