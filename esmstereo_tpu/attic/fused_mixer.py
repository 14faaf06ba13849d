"""Fused Pallas kernel for the ESM upsampler's ShuffleMixer section.

Counterpart of the reference's ``to_feat -> FMBlock x2 -> PixelShuffle``
chain inside ``upsample4`` (``/root/reference/models/ESMStereo.py:242-318``,
blocks from ``models/shufflemixer.py:23-132``). On TPU the plain lowering
of this section is the single most expensive part of the upsampler: every
LayerNorm / point-MLP / depthwise-7x7 / residual materializes a
(H/4, W/4, 16) tensor whose 16-channel lane dimension is padded to 128,
so each of the ~30 op groups moves ~8x its useful bytes — measured
0.62 ms per FMBlock at 544x960 on v5e (1.24 ms of the 3.7 ms upsampler).

This kernel runs the whole section in one ``pallas_call`` on a **flat-lane
layout** — rows are ``(H, W*C)`` vectors, every intermediate lives in VMEM
(the full 136x240 base-grid image fits: ~2-8 MB per buffer), and:

  * dense 3x3 convs are 9 shifted block-diagonal MXU matmuls
    (``kron(I_px, W[kh,kw])``; boundary pixels zero-masked on the shifted
    operand),
  * channel LayerNorm statistics are one ``kron(I_px, ones)`` matmul for
    the group sums (per-pixel 16-lane reductions without lane-splitting
    reshapes), computed in fp32 like the plain path,
  * the split-point MLPs fold the half-channel split, the concat with the
    passthrough half, AND the g=8 channel shuffle into the two matmul
    weight matrices (zero runtime permutation cost),
  * the depthwise 7x7 is 49 shifted VPU FMAs with boundary masking baked
    into statically zeroed tap constants,
  * the PixelShuffle 1x1 conv carries its phase-major output permutation
    in its matmul columns (the ``PhPixelShuffleUp`` trick, fused).

Eval-only; exactness vs the plain modules is covered by
tests/test_fused_mixer.py (interpret mode == plain composition).

STATUS — RETIRED from the hardware dispatch path (round 3). The kernel
is exact and its banded-matmul form cut the unrolled op count ~4x vs the
roll-FMA original, but Mosaic compilation at 544x960 (136x3840-flat
operands = ~500 vregs per op across ~150 ops) measured **2643 s (44
min)** through the remote-compile tunnel (2026-08-21 probe), with the
on-chip bf16-matmul form deviating up to 0.089 (mean 3e-3) from the
fp32 plain path. Row-tiling the grid does not rescue it:
the body compiles once regardless of grid size, so compile cost shrinks
only linearly with tile rows, while the +-15-row reach of the six
chained spatial stages (to_feat, 4x dw7, conv_expand) costs
(tile+30)/tile recompute — every tile size is either compile-bound or
~2x compute waste. Kept as tested groundwork with the integration hook
(ops.pallas.set_force_interpret) exercising the full wiring on CPU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esmstereo_tpu.nn.mixer import _LN_EPS, _shuffle_p, _up_perm_idx
from esmstereo_tpu.ops.pallas.fused_head import (
    _block_diag,
    _pw_px,
    _roll,
    _shift_flat,
)

Array = jax.Array

from esmstereo_tpu.nn.mixer import _C  # mixer channel width (16)


def _dense_bds(k: Array, px: int) -> Array:
    """(3,3,ci,co) conv kernel -> stacked (9, px*ci, px*co) block-diag
    matmul weights, one per tap."""
    mats = [_block_diag(k[kh, kw], px) for kh in range(3) for kw in range(3)]
    return jnp.stack(mats)


def _tile_row(v: Array, w: int) -> Array:
    """(C,) -> (1, W*C) per-pixel-tiled constant row."""
    return jnp.broadcast_to(v[None], (w, v.shape[0])).reshape(
        1, w * v.shape[0]).astype(jnp.float32)


def prepare_consts(params: dict, *, width: int) -> dict:
    """Fold the to_feat/block0/block1/up parameter subtrees (torch-layout,
    paths as produced by ``_UpStage``/``PhUpStage2x``) into the kernel's
    constant layout. ``width`` is the base-grid width W (= W_img/4)."""
    w = width
    f32 = jnp.float32

    tf = params["to_feat"]["Conv_0"]["kernel"].astype(f32)      # (3,3,32,16)
    ci_tf = tf.shape[2]
    consts: dict[str, Any] = {
        "ci_tf": int(ci_tf),
        "tf_bd": _dense_bds(tf, _pw_px(ci_tf, _C)),
        "ones_bd": _block_diag(jnp.ones((_C, _C), f32), 128 // _C),
    }

    p_mat = jnp.asarray(_shuffle_p(), f32)
    ln_rows, bd_a, bd_b, bd_c, b1_rows, mlp_rows = [], [], [], [], [], []
    dw_a0, dw_ap, dw_an, sp_bias = [], [], [], []
    ex_bds, ex_bias, pr_bds, pr_bias = [], [], [], []
    for bi in (0, 1):
        blk = params[f"block{bi}"]
        for si in (1, 2):
            sm = blk[f"sm{si}"]
            for mi in (1, 2):
                ln_rows.append(_tile_row(
                    sm[f"norm{mi}"]["weight"].astype(f32), w))
                mlp = sm[f"mlp{mi}"]
                w1 = mlp["fc1"]["Conv_0"]["kernel"].astype(f32)[0, 0]  # (8,16)
                b1 = mlp["fc1"]["Conv_0"]["bias"].astype(f32)
                w2 = mlp["fc2"]["Conv_0"]["kernel"].astype(f32)[0, 0]  # (16,8)
                b2 = mlp["fc2"]["Conv_0"]["bias"].astype(f32)
                half = w1.shape[0]
                a = jnp.zeros((_C, _C), f32).at[:half].set(w1)
                c2 = jnp.zeros((_C, _C), f32).at[:, :half].set(w2)
                s_hi = jnp.diag(jnp.asarray(
                    [0.0] * half + [1.0] * (_C - half), f32))
                bcat = jnp.zeros((_C,), f32).at[:half].set(b2)
                px = 128 // _C
                bd_a.append(_block_diag(a, px))
                bd_b.append(_block_diag(c2 @ p_mat, px))
                bd_c.append(_block_diag(s_hi @ p_mat, px))
                b1_rows.append(_tile_row(b1, w))
                mlp_rows.append(_tile_row(bcat @ p_mat, w))
            # depthwise 7x7 as banded matmuls: per row tap kh, one
            # within-group (128,128) band plus prev/next-group bands for
            # the +-3-pixel reach across the 8-pixel lane group. 21 MXU
            # matmuls replace 196 unrolled roll-FMAs — the VPU form's op
            # count pushed Mosaic compile past 20 min at 544x960.
            dk = sm["spatial"]["Conv_0"]["kernel"].astype(f32)[:, :, 0]
            px = 128 // _C
            m0 = np.zeros((7, px, px), np.float32)
            mp = np.zeros((7, px, px), np.float32)
            mn = np.zeros((7, px, px), np.float32)
            for po in range(px):
                for dx in range(-3, 4):
                    pi = po + dx
                    if 0 <= pi < px:
                        m0[dx + 3, pi, po] = 1.0
                    elif pi < 0:
                        mp[dx + 3, pi + px, po] = 1.0
                    else:
                        mn[dx + 3, pi - px, po] = 1.0
            eye = jnp.eye(_C, dtype=f32)
            for dst, m in ((dw_a0, m0), (dw_ap, mp), (dw_an, mn)):
                a = jnp.einsum("kdc,dpq,ce->kpcqe", dk,
                               jnp.asarray(m), eye)
                dst.append(a.reshape(7, px * _C, px * _C))
            sp_bias.append(_tile_row(
                sm["spatial"]["Conv_0"]["bias"].astype(f32), w))
        ek = blk["conv_expand"]["Conv_0"]["kernel"].astype(f32)  # (3,3,16,32)
        co_e = ek.shape[-1]
        ex_bds.append(_dense_bds(ek, _pw_px(_C, co_e)))
        ex_bias.append(_tile_row(
            blk["conv_expand"]["Conv_0"]["bias"].astype(f32), w))
        pk = blk["conv_project"]["Conv_0"]["kernel"].astype(f32)[0, 0]
        pr_bds.append(_block_diag(pk, _pw_px(co_e, _C)))
        pr_bias.append(_tile_row(
            blk["conv_project"]["Conv_0"]["bias"].astype(f32), w))

    uk = params["up"]["conv"]["Conv_0"]["kernel"].astype(f32)[0, 0]  # (16,64)
    ub = params["up"]["conv"]["Conv_0"]["bias"].astype(f32)
    idx = _up_perm_idx()
    consts.update(
        ln_rows=jnp.concatenate(ln_rows),        # (8, W*16)
        bd_a=jnp.stack(bd_a), bd_b=jnp.stack(bd_b), bd_c=jnp.stack(bd_c),
        b1_rows=jnp.concatenate(b1_rows),        # (8, W*16)
        mlp_rows=jnp.concatenate(mlp_rows),      # (8, W*16)
        # tap-major flat leading dims: Mosaic supports only ONE static
        # integer index into a ref without falling back to >2D gather
        dw_a0=jnp.concatenate(dw_a0),            # (4*7, 128, 128)
        dw_ap=jnp.concatenate(dw_ap),
        dw_an=jnp.concatenate(dw_an),
        sp_bias=jnp.concatenate(sp_bias),        # (4, W*16)
        ex_bds=jnp.concatenate(ex_bds),          # (2*9, 128, 8*co_e)
        ex_bias=jnp.concatenate(ex_bias),        # (2, W*co_e)
        pr_bds=jnp.stack(pr_bds),                # (2, 8*co_e, 128)
        pr_bias=jnp.concatenate(pr_bias),        # (2, W*16)
        up_bd=_block_diag(uk[:, idx], _pw_px(_C, uk.shape[-1])),
        up_bias=_tile_row(ub[idx], w),
        co_e=int(co_e),
    )
    return consts


def _shift_rows(x: Array, d: int) -> Array:
    """result[r] = x[r + d], zero rows outside the image."""
    if d == 0:
        return x
    z = jnp.zeros((abs(d), x.shape[1]), x.dtype)
    if d > 0:
        return jnp.concatenate([x[d:], z], axis=0)
    return jnp.concatenate([z, x[:d]], axis=0)


def _mm(x: Array, bd: Array, bf16: bool) -> Array:
    """Block-diagonal matmul on flat rows: (R, G*gin) @ (gin, gout)."""
    r, l = x.shape
    gin, gout = bd.shape
    g = l // gin
    lhs = x.reshape(r * g, gin)
    rhs = bd
    if bf16:
        lhs, rhs = lhs.astype(jnp.bfloat16), rhs.astype(jnp.bfloat16)
    y = jax.lax.dot_general(lhs, rhs, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.reshape(r, g * gout)


def fused_mixer_apply(x: Array, consts: dict, *,
                      interpret: bool = False) -> Array:
    """to_feat -> FMBlock x2 -> PhPixelShuffleUp(p_in=1), fused.

    ``x``: (B, H, W, 32) spx output (any float dtype); returns
    (B, H, W, 64) fp32 — the phase-major (p=2) shuffled-up feature, exactly
    what the stage tail (``PhConv`` at p=2) consumes.
    """
    b, h, w, ci = x.shape
    assert ci == consts["ci_tf"], (ci, consts["ci_tf"])
    assert (w * _C) % 128 == 0, ("W*16 must be lane-aligned", w)
    co_e = consts["co_e"]
    l_in, l_mid, l_ex = w * ci, w * _C, w * co_e
    l_out = w * 4 * _C
    xf = x.astype(jnp.float32).reshape(b, h, l_in)
    bf16 = not interpret

    def dense3x3(xx, bds_ref, bias_row, cin, sel=None):
        acc = None
        for kh in range(3):
            xr = _shift_rows(xx, kh - 1)
            for kw in range(3):
                d = kw - 1
                xs = _shift_flat(xr, -d * cin, interpret) if d else xr
                bd = bds_ref[sel * 9 + kh * 3 + kw] if sel is not None \
                    else bds_ref[kh * 3 + kw]
                y = _mm(xs, bd, bf16)
                acc = y if acc is None else acc + y
        if bias_row is not None:
            acc = acc + bias_row
        return acc

    def kernel(tf_ref, ones_ref, ln_ref, a_ref, bb_ref, c_ref, b1_ref,
               mr_ref, dw0_ref, dwp_ref, dwn_ref, spb_ref, ex_ref, exb_ref,
               pr_ref, prb_ref, up_ref, upb_ref, x_ref, out_ref):
        xx = x_ref[0]

        def ln(v, li):
            s1 = _mm(v, ones_ref[...], False)        # fp32 dot: exact stats
            s2 = _mm(v * v, ones_ref[...], False)
            mu = s1 * (1.0 / _C)
            var = s2 * (1.0 / _C) - mu * mu
            return (v - mu) / jnp.sqrt(var + _LN_EPS) * ln_ref[li][None]

        def mlp(t, mi):
            hh = jax.nn.silu(_mm(t, a_ref[mi], bf16) + b1_ref[mi][None])
            return (_mm(hh, bb_ref[mi], bf16) + _mm(t, c_ref[mi], bf16)
                    + mr_ref[mi][None])

        def dw7(v, si):
            # banded-matmul depthwise: prev/next lane-group views rolled
            # once, row boundaries zero-masked (the lane roll wraps the
            # row ends into the opposite group)
            lm = v.shape[-1]
            ids = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            vp = jnp.where(ids >= 128, _roll(v, 128, interpret), 0.0)
            vn = jnp.where(ids < lm - 128, _roll(v, -128, interpret), 0.0)
            acc = jnp.broadcast_to(spb_ref[si][None], v.shape)
            acc = acc.astype(jnp.float32)
            for dy in range(-3, 4):
                t = si * 7 + dy + 3
                acc = acc + _mm(_shift_rows(v, dy), dw0_ref[t], bf16)
                acc = acc + _mm(_shift_rows(vp, dy), dwp_ref[t], bf16)
                acc = acc + _mm(_shift_rows(vn, dy), dwn_ref[t], bf16)
            return acc

        def sm(v, si):
            v = v + mlp(ln(v, 2 * si), 2 * si)
            v = dw7(v, si)
            return v + mlp(ln(v, 2 * si + 1), 2 * si + 1)

        v = dense3x3(xx, tf_ref, None, ci)           # to_feat (no bias)
        for bi in range(2):
            y = sm(sm(v, 2 * bi), 2 * bi + 1)
            x2 = y + v
            z = jax.nn.silu(
                dense3x3(x2, ex_ref, exb_ref[bi][None], _C, sel=bi))
            z = _mm(z, pr_ref[bi], bf16) + prb_ref[bi][None]
            v = z + x2
        out = jax.nn.silu(_mm(v, up_ref[...], bf16) + upb_ref[...])
        out_ref[0] = out

    args = (consts["tf_bd"], consts["ones_bd"], consts["ln_rows"],
            consts["bd_a"], consts["bd_b"], consts["bd_c"],
            consts["b1_rows"], consts["mlp_rows"], consts["dw_a0"],
            consts["dw_ap"], consts["dw_an"],
            consts["sp_bias"], consts["ex_bds"], consts["ex_bias"],
            consts["pr_bds"], consts["pr_bias"], consts["up_bd"],
            consts["up_bias"], xf)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 18
        + [pl.BlockSpec((1, h, l_in), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, l_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, l_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, w, 4 * _C)


# mixer_reference (the plain-XLA default path) moved to
# esmstereo_tpu/nn/mixer.py when this kernel was retired to the attic.
from esmstereo_tpu.nn.mixer import mixer_reference  # noqa: F401,E402
