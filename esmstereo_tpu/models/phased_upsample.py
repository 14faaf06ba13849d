"""Phase-folded ESM upsampler (TPU fast path for the cv4 / L variant).

Executes ``Upsample4``'s half- and full-resolution stages entirely on the
1/4 base grid using ``nn.phasefold``: every fine-resolution conv becomes a
phase-mixing conv with MXU-friendly channel widths, pixel shuffles become
pure channel permutations, and the only fine-layout tensors are the
1-channel disparity residual streams (cheap to re-layout).

Parameter trees are path-compatible with ``models.esmstereo.Upsample4`` —
the same checkpoint drives either path. Used in eval mode only: the
same-size ring-mask emulation of the reference's shrink/grow ``dm`` stacks
(``ESMStereo.py:250-253``) is exact for eval BatchNorm (running stats) but
would perturb train-mode batch statistics.

Equivalence: tests/test_phased_upsample.py compares against Upsample4 with
shared parameters.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu import ops
from esmstereo_tpu.nn import init as tinit
from esmstereo_tpu.nn.blocks import ConvBlock, apply_act
from esmstereo_tpu.nn.folded3d import FoldedBatchNorm
from esmstereo_tpu.nn.phasefold import (
    apply_ring_mask,
    from_phases,
    phase_conv,
    ring_mask,
    to_phases,
)

Array = jax.Array


class _KernelParams(nn.Module):
    """Conv kernel (+ optional bias) at TorchConv-compatible paths:
    <name>/Conv_0/{kernel[,bias]} (nested) or <name>/kernel (deconv)."""

    shape: Sequence[int]
    init_fn: Callable
    bias: bool = False
    bias_init: Callable | None = None
    nested: bool = True

    @nn.compact
    def __call__(self):
        if self.nested:
            return _KernelLeaf(self.shape, self.init_fn, self.bias,
                               self.bias_init, name="Conv_0")()
        kernel = self.param("kernel", self.init_fn, tuple(self.shape))
        return kernel, None


class _KernelLeaf(nn.Module):
    shape: Sequence[int]
    init_fn: Callable
    bias: bool
    bias_init: Callable | None

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.init_fn, tuple(self.shape))
        bias = None
        if self.bias:
            bias = self.param("bias", self.bias_init or self.init_fn,
                              (self.shape[-1],))
        return kernel, bias


def _add_phase_bias(y: Array, bias: Array, p: int) -> Array:
    """Per-channel bias broadcast over phase-major channels."""
    co = bias.shape[0]
    b = jnp.tile(bias, (p * p,))
    return y + b.astype(y.dtype)


class PhConv(nn.Module):
    """Phase-space conv with TorchConv-compatible parameters."""

    features: int
    in_channels: int
    kernel_size: int
    pad: int
    p_in: int
    p_out: int
    mode: str = "conv"
    use_bias: bool = False
    init_mode: str = "torch"
    # flat=True: params at <name>/Conv_0/... (bare TorchConv layout);
    # flat=False: <name>/conv/Conv_0/... (ConvBlock's nested layout).
    flat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, ci, co = self.kernel_size, self.in_channels, self.features
        if self.mode == "deconv":
            fan_in = co * k * k
            bound = float(1.0 / np.sqrt(fan_in))

            def kinit(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            w, b = _KernelParams((k, k, ci, co), kinit, nested=False,
                                 name="conv")()
        else:
            kinit = {"torch": tinit.torch_conv_kernel,
                     "msra": tinit.msra_out}[self.init_mode]
            fan_in = ci * k * k
            if self.flat:
                w, b = _KernelLeaf((k, k, ci, co), kinit, self.use_bias,
                                   tinit.torch_conv_bias(fan_in),
                                   name="Conv_0")()
            else:
                w, b = _KernelParams(
                    (k, k, ci, co), kinit, bias=self.use_bias,
                    bias_init=tinit.torch_conv_bias(fan_in), name="conv")()
        y = phase_conv(x, w, self.mode, self.pad, self.p_in, self.p_out,
                       dtype=self.dtype)
        if b is not None:
            y = _add_phase_bias(y, b, self.p_out)
        return y


class PhConvBlock(nn.Module):
    """Phase-space ConvBlock: conv -> BN (per true channel, over phases)
    -> act [-> ring mask]. Param paths match ``ConvBlock``."""

    features: int
    in_channels: int
    kernel_size: int
    pad: int
    p_in: int
    p_out: int
    mode: str = "conv"
    bn: bool = True
    act: str | None = "gelu"
    mask: Any = None  # static ring mask or None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        # conv params declared inline so the child scope is named "conv"
        k, ci, co = self.kernel_size, self.in_channels, self.features
        if self.mode == "deconv":
            fan_in = co * k * k
            bound = float(1.0 / np.sqrt(fan_in))

            def kinit(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            w, _ = _KernelParams((k, k, ci, co), kinit, nested=False,
                                 name="conv")()
        else:
            kinit = tinit.torch_conv_kernel
            w, _ = _KernelParams((k, k, ci, co), kinit, name="conv")()
        y = phase_conv(x, w, self.mode, self.pad, self.p_in, self.p_out,
                       dtype=self.dtype)
        if self.bn:
            y = FoldedBatchNorm(co, use_running_average=not train,
                                dtype=self.dtype, name="bn")(y)
        y = apply_act(y, self.act)
        if self.mask is not None:
            y = apply_ring_mask(y, self.p_out, self.mask)
        return y


class PhDispFeatures(nn.Module):
    """Phase-space ``dm`` stack: same-size emulation of k5p1/k3p1/k3p1/k1p1
    with fine-border ring masks (see phasefold.ring_mask docs)."""

    channels: int
    p: int
    dtype: Any = None

    @nn.compact
    def __call__(self, disp_ph: Array, *, train: bool = False) -> Array:
        c, p = self.channels, self.p
        h, w = disp_ph.shape[1], disp_ph.shape[2]
        m = ring_mask(h, w, p)
        x = PhConvBlock(c, 1, 5, 2, p, p, mask=m, dtype=self.dtype,
                        name="conv0")(disp_ph, train=train)
        x = PhConvBlock(c, c, 3, 1, p, p, mask=m, dtype=self.dtype,
                        name="conv1")(x, train=train)
        x = PhConvBlock(c, c, 3, 1, p, p, mask=m, dtype=self.dtype,
                        name="conv2")(x, train=train)
        # final k1/p1: the masked ring stays zero through a 1x1 conv, and
        # BN+GELU then produce the reference's gelu(bn(0)) border band.
        x = PhConvBlock(c, c, 1, 0, p, p, dtype=self.dtype,
                        name="conv3")(x, train=train)
        return x


class PhSpx(nn.Module):
    """Phase-space SpxBlock: ConvBlock -> conv3x3 -> BN -> GELU."""

    mid: int
    out: int
    in_channels: int
    p: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = PhConvBlock(self.mid, self.in_channels, 3, 1, self.p, self.p,
                        dtype=self.dtype, name="conv0")(x, train=train)
        x = PhConv(self.out, self.mid, 3, 1, self.p, self.p, flat=True,
                   dtype=self.dtype, name="conv1")(x)
        x = FoldedBatchNorm(self.out, use_running_average=not train,
                            dtype=self.dtype, name="bn")(x)
        return apply_act(x, "gelu")


def _phase_cat(a: Array, b: Array, p: int, ca: int, cb: int) -> Array:
    """Concat true channels inside each phase block (phase-major layout)."""
    bs, h, w, _ = a.shape
    ar = a.reshape(bs, h, w, p * p, ca)
    br = b.reshape(bs, h, w, p * p, cb)
    return jnp.concatenate([ar, br], axis=-1).reshape(bs, h, w, -1)


def _shuffle_perm(ci_out: int, r: int, p_in: int) -> np.ndarray:
    """Channel permutation: phase-major (p, (c, ry, rx)) -> phase-major
    ((p*r grid), c) after a pixel shuffle by r at the fine level."""
    src = []
    for py in range(p_in):
        for px in range(p_in):
            for c in range(ci_out):
                for ry in range(r):
                    for rx in range(r):
                        qy, qx = py * r + ry, px * r + rx
                        dst = ((qy * (p_in * r)) + qx) * ci_out + c
                        src.append(dst)
    n = len(src)
    perm = np.zeros((n, n), np.float32)
    for s_idx, d_idx in enumerate(src):
        perm[s_idx, d_idx] = 1.0
    return perm


class PhPixelShuffleUp(nn.Module):
    """PixelShuffleUp in phase space: 1x1 conv + channel permutation + SiLU.

    Input phases ``p_in`` -> output phases ``p_in * 2``.
    """

    dim: int
    in_channels: int
    p_in: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        r, co, ci, p = 2, self.dim, self.in_channels, self.p_in
        fan_in = ci
        bound = float(1.0 / np.sqrt(fan_in))

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w, b = _KernelParams((1, 1, ci, co * r * r), uinit, bias=True,
                             bias_init=uinit, name="conv")()
        # block-diagonal 1x1 over phases
        y = phase_conv(x, w, "conv", 0, p, p, dtype=self.dtype)
        y = _add_phase_bias(y, b, p)
        perm = _shuffle_perm(co, r, p)
        y = jnp.einsum("...i,ij->...j", y, jnp.asarray(perm, y.dtype))
        return jax.nn.silu(y)


class PhUpRefinement(nn.Module):
    """Phase-space UpRefinement: phased entry/exit, plain interior.

    ``p``: phases of the disparity input. ``f1`` joins at 1/4-of-disp res
    (plain when p==2, phased p//2... — in Upsample4 both joins are plain
    or p=2 tensors; handled by the callers passing matching layouts).
    """

    channels: int
    p: int                       # phases of disp input (2 or 4)
    f1_phases: int               # phases of f1 (1 or 2)... f1 joins conv2
    f2_phases: int               # phases of f2 (1 or 2), joins conv1
    f1_channels: int
    f2_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, disp_ph: Array, f1: Array, f2: Array,
                 *, train: bool = False) -> Array:
        c, p = self.channels, self.p

        # conv1: k3 s2 from p phases -> p//2 phases
        p1 = p // 2
        conv1 = PhConvBlock(c, 1, 3, 1, p, p1, dtype=self.dtype,
                            name="conv1_0")(disp_ph, train=train)
        if p1 == 1:
            conv1 = ConvBlock(c, 3, 1, 1, dtype=self.dtype,
                              name="conv1_1")(conv1, train=train)
        else:
            conv1 = PhConvBlock(c, c, 3, 1, p1, p1, dtype=self.dtype,
                                name="conv1_1")(conv1, train=train)

        # conv2: k3 s2 -> p//4 phases (plain in all Upsample4 uses)
        if p1 == 1:
            conv2 = ConvBlock(c, 3, 2, 1, dtype=self.dtype,
                              name="conv2_0")(conv1, train=train)
        else:
            conv2 = PhConvBlock(c, c, 3, 1, p1, 1, dtype=self.dtype,
                                name="conv2_0")(conv1, train=train)
        conv2 = ConvBlock(c, 3, 1, 1, dtype=self.dtype,
                          name="conv2_1")(conv2, train=train)

        conv3 = ConvBlock(c, 3, 2, 1, dtype=self.dtype,
                          name="conv3_0")(conv2, train=train)
        conv3 = ConvBlock(c, 3, 1, 1, dtype=self.dtype,
                          name="conv3_1")(conv3, train=train)

        conv3_up = ConvBlock(c, 4, 2, 1, deconv=True, dtype=self.dtype,
                             name="conv3_up")(conv3, train=train)
        conv3_up = conv3_up[:, :conv2.shape[1], :conv2.shape[2]]
        assert self.f1_phases == 1
        conv2 = jnp.concatenate([conv3_up, conv2, f1], axis=-1)
        conv2 = ConvBlock(c, 1, 1, 0, dtype=self.dtype,
                          name="agg_0_0")(conv2, train=train)
        conv2 = ConvBlock(c, 3, 1, 1, dtype=self.dtype,
                          name="agg_0_1")(conv2, train=train)

        # conv2_up: deconv back to p1 phases
        if p1 == 1:
            conv2_up = ConvBlock(c, 4, 2, 1, deconv=True, dtype=self.dtype,
                                 name="conv2_up")(conv2, train=train)
            cat = jnp.concatenate([conv2_up, conv1, f2], axis=-1)
            cat_p = 1
            in_ch = cat.shape[-1]
        else:
            conv2_up = PhConvBlock(c, c, 4, 1, 1, p1, mode="deconv",
                                   dtype=self.dtype,
                                   name="conv2_up")(conv2, train=train)
            assert self.f2_phases == p1
            cat = _phase_cat(_phase_cat(conv2_up, conv1, p1, c, c), f2, p1,
                             2 * c, self.f2_channels)
            cat_p = p1
            in_ch = 2 * c + self.f2_channels

        if cat_p == 1:
            agg1 = ConvBlock(c, 1, 1, 0, dtype=self.dtype,
                             name="agg_1_0")(cat, train=train)
            agg1 = ConvBlock(c, 3, 1, 1, dtype=self.dtype,
                             name="agg_1_1")(agg1, train=train)
            out = PhConvBlock(1, c, 4, 1, 1, 2, mode="deconv", bn=False,
                              act=None, dtype=self.dtype,
                              name="conv1_up")(agg1, train=train)
            return out  # phases 2
        agg1 = PhConvBlock(c, in_ch, 1, 0, cat_p, cat_p, dtype=self.dtype,
                           name="agg_1_0")(cat, train=train)
        agg1 = PhConvBlock(c, c, 3, 1, cat_p, cat_p, dtype=self.dtype,
                           name="agg_1_1")(agg1, train=train)
        return PhConvBlock(1, c, 4, 1, cat_p, 2 * cat_p, mode="deconv",
                           bn=False, act=None, dtype=self.dtype,
                           name="conv1_up")(agg1, train=train)


class PhUpStage2x(nn.Module):
    """stage2x of Upsample4: interior at 1/4 (plain), exit at 1/2 (p=2)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, f1x: Array, f2x: Array, init_disp: Array,
                 *, train: bool = False) -> Array:
        from esmstereo_tpu.models.esmstereo import DispFeatures, SpxBlock
        from esmstereo_tpu.nn.blocks import TorchConv
        from esmstereo_tpu.nn.shufflemixer import FMBlock

        dt = self.dtype
        d = DispFeatures(32, dtype=dt, name="dm")(init_disp, train=train)
        x = SpxBlock(32, 32, dtype=dt, name="spx")(
            jnp.concatenate([d, f2x], axis=-1), train=train)
        x = TorchConv(16, 3, 1, 1, dtype=dt, name="to_feat")(x)
        x = FMBlock(16, 7, 2, dtype=dt, name="block0")(x)
        x = FMBlock(16, 7, 2, dtype=dt, name="block1")(x)
        x = PhPixelShuffleUp(16, 16, 1, dtype=dt, name="up")(x)
        x = PhConv(1, 16, 3, 1, 2, 2, use_bias=True, flat=True, dtype=dt,
                   name="tail")(x)
        x2 = PhUpRefinement(32, 2, 1, 1, 96, 48, dtype=dt, name="ref")(
            x, f1x, f2x, train=train)
        from esmstereo_tpu.nn.phasefold import phase_bilinear2x
        return phase_bilinear2x(init_disp) + x2  # phases 2


class PhUpStage4x(nn.Module):
    """stage4x of Upsample4: p=2 interior, p=4 exit."""

    dtype: Any = None

    @nn.compact
    def __call__(self, up2_ph: Array, f2x: Array, f4x: Array,
                 *, train: bool = False) -> Array:
        dt = self.dtype
        d4 = PhDispFeatures(32, 2, dtype=dt, name="dm")(up2_ph, train=train)
        f4x_ph = to_phases(f4x, 2)
        fused = _phase_cat(d4, f4x_ph, 2, 32, f4x.shape[-1])
        x4 = PhSpx(32, 16, 32 + f4x.shape[-1], 2, dtype=dt, name="spx")(
            fused, train=train)
        x4 = PhPixelShuffleUp(16, 16, 2, dtype=dt, name="up")(x4)
        x4 = PhConv(1, 16, 3, 1, 4, 4, use_bias=True, flat=True, dtype=dt,
                    name="tail")(x4)
        x4 = PhUpRefinement(32, 4, 1, 2, 48, 32, dtype=dt, name="ref")(
            x4, f2x, f4x_ph, train=train)

        up2_fine = from_phases(up2_ph, 2)
        return to_phases(ops.upsample2x_bilinear(up2_fine), 4) + x4


class PhUpsample4(nn.Module):
    """Phase-folded twin of ``Upsample4`` (cv4 / L variant, eval path).

    Same call signature and parameter tree as ``Upsample4``; all half/full
    resolution computation runs on the 1/4 base grid.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, f1x: Array, f2x: Array, f4x: Array, init_disp: Array,
                 *, train: bool = False) -> tuple[Array, Array]:
        up2 = PhUpStage2x(dtype=self.dtype, name="stage2x")(
            f1x, f2x, init_disp, train=train)
        up4 = PhUpStage4x(dtype=self.dtype, name="stage4x")(
            up2, f2x, f4x, train=train)
        return from_phases(up4, 4), from_phases(up2, 2)
