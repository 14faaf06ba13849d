"""Pallas TPU kernel: fused shift-and-correlate cost-volume build.

Replaces the reference's python-loop-over-48-shifts volume builders
(``/root/reference/models/submodule.py:151-200``) with one kernel that holds
a row-block of both feature maps in VMEM and emits every disparity plane in
a single pass — one HBM read of each input, one HBM write of the volume.

Design notes:
  * The group-mean is expressed as a matmul with a (C, G) group-indicator
    matrix so the reduction runs on the MXU instead of relayouting the lane
    dimension (channels-per-group is tiny — 2 for gwc).
  * The target is pre-padded by D-1 columns on the host (fuses into the
    producer), so every disparity shift is a static VMEM slice.
  * L2 normalisation (norm_correlation / gwc_norm variants) is a pointwise
    per-pixel op, applied on the host side where XLA fuses it into the pad.
  * Output dtype follows the input (bf16 halves the volume's HBM traffic —
    the op is write-bound: D*G floats out per C floats in).

The jnp reference implementations in ``esmstereo_tpu.ops.cost_volume`` are
the golden model; see ``tests/test_pallas_correlation.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_EPS = 1e-5


def _pick_block(n: int, target: int) -> int:
    for t in range(target, 0, -1):
        if n % t == 0:
            return t
    return 1


def _corr_kernel(ref_ref, tgt_ref, gmat_ref, out_ref, *, max_disp: int,
                 td: int):
    """Grid cell = (batch, row-block, disparity-block): emits ``td`` planes.

    The disparity axis is tiled because the G lane dimension pads to 128 in
    VMEM — a full-D output block would blow the 16 MB VMEM budget at
    production widths (the ``scoped vmem`` OOM this replaces).
    """
    ref = ref_ref[0]            # (TH, W, C)
    gmat = gmat_ref[...]        # (C, G)
    di = pl.program_id(2)
    th, w, c = ref.shape
    refs2d = ref.reshape(th * w, c)
    for i in range(td):
        # d = di * td + i; shift offset in the left-padded target
        start = max_disp - 1 - i - di * td
        shifted = tgt_ref[0, :, pl.ds(start, w), :].reshape(th * w, c)
        prod = refs2d * shifted
        cost = jnp.dot(prod, gmat, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        out_ref[0, i] = cost.reshape(th, w, -1).astype(out_ref.dtype)


def _corr_kernel_folded(ref_ref, tgt_ref, gmat_ref, out_ref, *,
                        max_disp: int, td: int, pack: int, ws: int):
    """Grid cell = (batch, row-block, disparity-block): emits one folded
    channel-block of ``td * G`` lanes (d-major, matching ``nn.folded3d``).

    ``pack`` disparity shifts are concatenated along lanes and contracted
    in ONE matmul against a block-diagonal group matrix: a single-shift
    matmul is (TH*W, C) @ (C, G) = K=64, N=32 for the gwc config — ~12%
    of the MXU's 128x128 tile. Packing four shifts makes it (TH*W, 4C) @
    (4C, 4G) = K=256, N=128 — full lanes, identical math (the off-diagonal
    blocks are structural zeros, and adding 0.0 terms is exact in fp32).
    Measured 544x960 L fp32: 1.65 -> 0.64 ms.

    The target (left-padded by ``max_disp`` columns on the host) is loaded
    once per grid cell at a sublane-ALIGNED offset — Mosaic rejects
    unaligned dynamic sublane loads for 16-bit dtypes — and the per-d
    shifts are realised as static ``pltpu.roll`` + slice, which is a cheap
    register shuffle. Rolling left by ``k <= td`` only wraps columns into
    positions ``>= w``, which the ``[:, :w]`` slice discards.
    """
    ref = ref_ref[0]            # (TH, W, C)
    gmat = gmat_ref[...]        # (pack*C, pack*G) block-diagonal
    di = pl.program_id(2)
    th, w, c = ref.shape
    refs2d = ref.reshape(th * w, c)
    ref_tile = jnp.concatenate([refs2d] * pack, axis=-1)  # (TH*W, pack*C)
    # window start must be a sublane multiple: td is either a multiple of 8
    # (with max_disp % 8 == 0) or equals max_disp (start == 0). See caller.
    # The window SIZE ws is w + td rounded up to a sublane multiple (the
    # caller pads the target so the slice stays in bounds).
    wstart = max_disp - (di + 1) * td
    window = tgt_ref[0, :, pl.ds(wstart, ws), :]   # (TH, ws, C)
    blocks = []
    for j in range(td // pack):
        shifts = []
        for i in range(j * pack, (j + 1) * pack):
            # d = di * td + i lives at window column offset td - i; roll is
            # circular and requires a non-negative shift, so the left-roll
            # by (td - i) is a right-roll by ws - td + i. Positions [0, w)
            # then hold window[col + td - i] with no wrap-around
            # contamination (col + td - i <= w + td - 1 < ws).
            shifted = pltpu.roll(window, shift=ws - td + i,
                                 axis=1)[:, :w, :]
            shifts.append(shifted.reshape(th * w, c))
        prod = ref_tile * jnp.concatenate(shifts, axis=-1)
        # d-major within the pack: plane i occupies lanes [i*G, (i+1)*G)
        if out_ref.dtype == jnp.bfloat16:
            # bf16 output: quantize the products (not just the result) and
            # run a single-pass bf16 MXU dot — matches the plain jnp path,
            # where bf16 descriptors multiply in bf16 before the group
            # mean. fp32 HIGHEST dots cost ~6 MXU passes and dominated the
            # kernel (0.94 -> ~0.4 ms at 544x960 L).
            cost = jnp.dot(prod.astype(jnp.bfloat16),
                           gmat.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            cost = jnp.dot(prod, gmat, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        blocks.append(cost.reshape(th, w, -1))
    out_ref[0] = jnp.concatenate(blocks, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "num_groups",
                                             "normalize", "interpret"))
def correlation_volume_folded(ref: Array, tgt: Array, max_disp: int,
                              num_groups: int,
                              normalize: bool = False,
                              interpret: bool = False) -> Array:
    """Depth-folded cost volume ``(B, H, W, D*G)`` via one Pallas pass.

    Counterpart of ``ops.build_gwc_volume_folded`` /
    ``ops.build_norm_correlation_volume_folded`` (reference math
    ``submodule.py:143-161,187-200``). The jnp formulation makes XLA
    materialize a re-laid-out copy of the feature map per disparity shift
    (~0.5 GB of layout copies per frame at 544x960 L); here each row-block
    of both feature maps is read once and every disparity plane is computed
    in VMEM and stored once, d-major, exactly as ``FoldedConvBlock3D``
    consumes it.
    """
    b, h, w, c = ref.shape
    assert c % num_groups == 0, (c, num_groups)
    cpg = c // num_groups
    out_dtype = ref.dtype

    # Kernel-internal compute is fp32: Mosaic rejects sub-128-lane bf16
    # vector loads (C=64 here), and the op is WRITE-bound (D*G lanes out
    # per C in) so only the output dtype matters for bandwidth. The
    # upcast fuses into the pad/producer.
    ref = ref.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)

    if normalize:
        def l2n(x):
            xg = x.reshape(b, h, w, num_groups, cpg)
            n = jnp.linalg.norm(xg, axis=-1, keepdims=True)
            return (xg / (n + _EPS)).reshape(b, h, w, c)
        ref, tgt = l2n(ref), l2n(tgt)

    itemsize = out_dtype.itemsize
    budget = 4 * 1024 * 1024
    th = _pick_block(h, 4)
    # Valid disparity tiles: td | max_disp, and the window start
    # ``max_disp - (di+1)*td`` must be a sublane multiple for every di —
    # guaranteed by 8 | td (with 8 | max_disp), or trivially by
    # td == max_disp (single block, start 0). Among those, prefer the
    # largest that fits the VMEM budget and fills >=128 lanes.
    per_plane = th * w * max(num_groups, 1) * itemsize
    target = max(1, budget // max(per_plane, 1))
    valid = [t for t in range(1, max_disp + 1)
             if max_disp % t == 0
             and (t == max_disp or (t % 8 == 0 and max_disp % 8 == 0))]
    fitting = [t for t in valid if t <= target and t * num_groups >= 128]
    if not fitting:  # small G: take the widest block the budget allows
        fitting = [t for t in valid if t <= target] or [min(valid)]
    td = max(fitting)

    # Shifts per matmul: fill the MXU's 128 output lanes (pack*G) without
    # letting the contraction side (pack*C) grow past 512.
    pack = max(p for p in range(1, td + 1)
               if td % p == 0 and p * num_groups <= 128 and p * c <= 512)

    # Mosaic requires 8-aligned sublane (width) slice shapes; non-aligned
    # widths (e.g. 544x960 cv16 -> w=60) are zero-padded to w8 and sliced
    # back — exact: right-pad columns never feed cols < w, and padded ref
    # cols only produce discarded output. The in-kernel window is likewise
    # widened to an aligned ws, with the target padded so the maximal
    # slice (wstart = max_disp - td) stays in bounds.
    w_true = w
    w = -(-w // 8) * 8
    ws = -(-(w + td) // 8) * 8
    if w != w_true:
        ref = jnp.pad(ref, ((0, 0), (0, 0), (0, w - w_true), (0, 0)))
    # left pad: a full max_disp (not max_disp - 1) keeps every window
    # start sublane-aligned; right pad covers the widened window.
    tgt_pad = jnp.pad(tgt, ((0, 0), (0, 0),
                            (max_disp, (ws - td) - w_true), (0, 0)))

    gmat = np.zeros((pack * c, pack * num_groups), np.float32)
    for i in range(pack):
        for ch in range(c):
            gmat[i * c + ch, i * num_groups + ch // cpg] = 1.0 / cpg
    gmat = jnp.asarray(gmat)

    out_shape = jax.ShapeDtypeStruct((b, h, w, max_disp * num_groups),
                                     out_dtype)
    grid = (b, h // th, max_disp // td)
    wp = max_disp + (ws - td)
    bytes_acc = (th * w * c + th * wp * c) * itemsize * (max_disp // td) \
        + max_disp * th * w * num_groups * itemsize

    out = pl.pallas_call(
        functools.partial(_corr_kernel_folded, max_disp=max_disp, td=td,
                          pack=pack, ws=ws),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, hi, di: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, c), lambda bi, hi, di: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pack * c, pack * num_groups),
                         lambda bi, hi, di: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, td * num_groups),
                               lambda bi, hi, di: (bi, hi, 0, di),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * max_disp * c,
            bytes_accessed=bytes_acc * b * (h // th),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ref, tgt_pad, gmat)
    if w != w_true:
        out = out[:, :, :w_true]
    return out


@functools.partial(jax.jit, static_argnames=("max_disp", "num_groups",
                                             "normalize", "interpret"))
def correlation_volume(ref: Array, tgt: Array, max_disp: int,
                       num_groups: int, normalize: bool = False,
                       interpret: bool = False) -> Array:
    """Cost volume ``(B, D, H, W, G)`` via the fused Pallas kernel.

    ``num_groups=1`` + ``normalize=True``  == build_norm_correlation_volume
    ``num_groups=G`` + ``normalize=False`` == build_gwc_volume
    ``num_groups=G`` + ``normalize=True``  == build_gwc_volume_norm
    """
    b, h, w, c = ref.shape
    assert c % num_groups == 0, (c, num_groups)
    cpg = c // num_groups
    out_dtype = ref.dtype

    # fp32 kernel internals (Mosaic rejects sub-128-lane bf16 loads);
    # output keeps the caller's dtype — see correlation_volume_folded.
    ref = ref.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)

    if normalize:
        def l2n(x):
            xg = x.reshape(b, h, w, num_groups, cpg)
            n = jnp.linalg.norm(xg, axis=-1, keepdims=True)
            return (xg / (n + _EPS)).reshape(b, h, w, c)
        ref, tgt = l2n(ref), l2n(tgt)

    # group-indicator matrix: mean over each group's channels
    gmat = np.zeros((c, num_groups), np.float32)
    for ch in range(c):
        gmat[ch, ch // cpg] = 1.0 / cpg
    gmat = jnp.asarray(gmat)

    tgt_pad = jnp.pad(tgt, ((0, 0), (0, 0), (max_disp - 1, 0), (0, 0)))

    # VMEM budget: the G lane dim pads to 128, so size blocks assuming
    # lanes=max(G, 128). Keep the double-buffered output tile under ~4 MB.
    lanes = max(num_groups, 128)
    itemsize = out_dtype.itemsize
    budget = 4 * 1024 * 1024
    th = _pick_block(h, 2)
    td = _pick_block(max_disp, max(1, budget // (th * w * lanes * itemsize)))

    out_shape = jax.ShapeDtypeStruct((b, max_disp, h, w, num_groups),
                                     out_dtype)
    grid = (b, h // th, max_disp // td)
    wp = w + max_disp - 1
    bytes_acc = (th * w * c + th * wp * c) * itemsize \
        + max_disp * th * w * num_groups * itemsize

    return pl.pallas_call(
        functools.partial(_corr_kernel, max_disp=max_disp, td=td),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, hi, di: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, c), lambda bi, hi, di: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda bi, hi, di: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, td, th, w, num_groups),
                               lambda bi, hi, di: (bi, di, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * max_disp * c,
            bytes_accessed=bytes_acc * b * (h // th),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ref, tgt_pad, gmat)
