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
    interleave_indices,
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
    in_perm: Any = None  # static lane gather folded into the kernel
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
                       dtype=self.dtype, in_perm=self.in_perm)
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
    in_perm: Any = None  # static lane gather folded into the kernel
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
                       dtype=self.dtype, in_perm=self.in_perm)
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
    in_perm: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = PhConvBlock(self.mid, self.in_channels, 3, 1, self.p, self.p,
                        in_perm=self.in_perm, dtype=self.dtype,
                        name="conv0")(x, train=train)
        x = PhConv(self.out, self.mid, 3, 1, self.p, self.p, flat=True,
                   dtype=self.dtype, name="conv1")(x)
        x = FoldedBatchNorm(self.out, use_running_average=not train,
                            dtype=self.dtype, name="bn")(x)
        return apply_act(x, "gelu")


def _cat_perm(p: int, *arrays_and_sizes) -> tuple[Array, np.ndarray]:
    """Plain lane concat of phase-major tensors + the static gather that
    the NEXT conv folds into its kernel (``phase_conv(in_perm=...)``) to
    see the phase-interleaved layout. Replaces the old ``_phase_cat``,
    whose lane-splitting reshapes cost a relayout copy per call on TPU."""
    arrays = arrays_and_sizes[0::2]
    sizes = list(arrays_and_sizes[1::2])
    cat = jnp.concatenate(arrays, axis=-1)
    return cat, interleave_indices(p * p, sizes)


def _shuffle_perm_idx(ci_out: int, r: int, p_in: int) -> np.ndarray:
    """Output-lane gather for a pixel shuffle by ``r`` at the fine level:
    ``y_shuffled = y[..., idx]`` where y is phase-major (p, (c, ry, rx))
    and the result is phase-major ((p*r grid), c). Folded into the 1x1
    conv's output channels (``phase_conv(out_perm=...)``) instead of a
    runtime permutation matmul on the activation."""
    src = []
    for py in range(p_in):
        for px in range(p_in):
            for c in range(ci_out):
                for ry in range(r):
                    for rx in range(r):
                        qy, qx = py * r + ry, px * r + rx
                        dst = ((qy * (p_in * r)) + qx) * ci_out + c
                        src.append(dst)
    return np.argsort(np.asarray(src, np.int64))


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
        # block-diagonal 1x1 over phases; the shuffle permutation is
        # folded into the kernel's output lanes (free at runtime)
        idx = _shuffle_perm_idx(co, r, p)
        y = phase_conv(x, w, "conv", 0, p, p, dtype=self.dtype, out_perm=idx)
        y = y + jnp.tile(b, p * p)[idx].astype(y.dtype)
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
            cat, cat_perm = _cat_perm(p1, conv2_up, c, conv1, c,
                                      f2, self.f2_channels)
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
        agg1 = PhConvBlock(c, in_ch, 1, 0, cat_p, cat_p, in_perm=cat_perm,
                           dtype=self.dtype,
                           name="agg_1_0")(cat, train=train)
        agg1 = PhConvBlock(c, c, 3, 1, cat_p, cat_p, dtype=self.dtype,
                           name="agg_1_1")(agg1, train=train)
        return PhConvBlock(1, c, 4, 1, cat_p, 2 * cat_p, mode="deconv",
                           bn=False, act=None, dtype=self.dtype,
                           name="conv1_up")(agg1, train=train)


class _LNParams(nn.Module):
    """ChannelLayerNorm weight at the module-compatible path."""

    dim: int = 16

    @nn.compact
    def __call__(self):
        return {"weight": self.param("weight", nn.initializers.ones,
                                     (self.dim,))}


def _conv_holder(shape, name, bias=True) -> dict:
    """TorchConv-compatible param subtree <name>/Conv_0/{kernel[,bias]}
    with torch init (flax derives param RNGs from the PATH, so matching
    names reproduce the plain modules' init values exactly)."""
    from esmstereo_tpu.backbones.fused import _ConvParams

    return {"Conv_0": _ConvParams(tuple(shape), bias=bias, init="torch",
                                  name=name)()}


class _SMParams(nn.Module):
    """SMLayer parameter tree (norm1/mlp1/spatial/norm2/mlp2 paths)."""

    dim: int = 16

    @nn.compact
    def __call__(self) -> dict:
        c = self.dim
        return {
            "norm1": _LNParams(c, name="norm1")(),
            "mlp1": _MLPParams(c, name="mlp1")(),
            "spatial": _conv_holder((7, 7, 1, c), "spatial"),
            "norm2": _LNParams(c, name="norm2")(),
            "mlp2": _MLPParams(c, name="mlp2")(),
        }


class _MLPParams(nn.Module):
    """SplitPointMlp parameter tree (fc1/fc2)."""

    dim: int = 16

    @nn.compact
    def __call__(self) -> dict:
        c = self.dim
        return {
            "fc1": _conv_holder((1, 1, c // 2, c), "fc1"),
            "fc2": _conv_holder((1, 1, c, c // 2), "fc2"),
        }


class _FMParams(nn.Module):
    """FMBlock parameter tree (sm1/sm2/conv_expand/conv_project)."""

    dim: int = 16

    @nn.compact
    def __call__(self) -> dict:
        c = self.dim
        return {
            "sm1": _SMParams(c, name="sm1")(),
            "sm2": _SMParams(c, name="sm2")(),
            "conv_expand": _conv_holder((3, 3, c, c * 2), "conv_expand"),
            "conv_project": _conv_holder((1, 1, c * 2, c), "conv_project"),
        }


class _UpParams(nn.Module):
    """PhPixelShuffleUp parameter tree (conv/Conv_0; torch 1x1 init ==
    the module's U(-1/sqrt(ci), ..) for both kernel and bias)."""

    dim: int = 16

    @nn.compact
    def __call__(self) -> dict:
        c = self.dim
        return {"conv": _conv_holder((1, 1, c, c * 4), "conv")}


class PhUpStage2x(nn.Module):
    """stage2x of Upsample4: interior at 1/4 (plain), exit at 1/2 (p=2)."""

    dtype: Any = None
    fuse_mixer: bool = False
    wphase_mixer: bool = False

    @nn.compact
    def __call__(self, f1x: Array, f2x: Array, init_disp: Array,
                 *, train: bool = False) -> Array:
        from esmstereo_tpu.models.esmstereo import DispFeatures, SpxBlock
        from esmstereo_tpu.nn import mixer as _mx

        dt = self.dtype
        d = DispFeatures(32, dtype=dt, name="dm")(init_disp, train=train)
        x = SpxBlock(32, 32, dtype=dt, name="spx")(
            jnp.concatenate([d, f2x], axis=-1), train=train)
        # to_feat + FMBlock x2 + shuffle-up as ONE Pallas kernel on
        # accelerator backends: the plain lowering's 16-channel tensors
        # run at 12% lane utilization (~1.3 ms of the frame; see the
        # kernel docstring). Same param tree either way (holders declare
        # the plain modules' exact paths).
        mix_params = {
            "to_feat": _conv_holder((3, 3, x.shape[-1], 16), "to_feat",
                                    bias=False),
            "block0": _FMParams(16, name="block0")(),
            "block1": _FMParams(16, name="block1")(),
            "up": _UpParams(16, name="up")(),
        }
        from esmstereo_tpu.ops import pallas as _plmod
        run_kernel = (self.fuse_mixer and not train
                      and not self.is_initializing()
                      and _plmod.accel_ok()
                      and (x.shape[2] * 16) % 128 == 0)
        if run_kernel:
            from esmstereo_tpu.attic import fused_mixer as _fm
            consts = _fm.prepare_consts(mix_params, width=x.shape[2])
            x = _fm.fused_mixer_apply(x, consts,
                                      interpret=_plmod.force_interpret())
            x = x.astype(dt or x.dtype)
        elif (self.wphase_mixer and not train
              and x.shape[2] % 8 == 0):
            from esmstereo_tpu.attic.wphase import mixer_wphase
            x = mixer_wphase(x, mix_params, dtype=dt)
        else:
            x = _mx.mixer_reference(x, mix_params, dtype=dt)
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
        fused, fperm = _cat_perm(2, d4, 32, f4x_ph, f4x.shape[-1])
        x4 = PhSpx(32, 16, 32 + f4x.shape[-1], 2, in_perm=fperm, dtype=dt,
                   name="spx")(fused, train=train)
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
    fuse_mixer: bool = False
    wphase_mixer: bool = False

    @nn.compact
    def __call__(self, f1x: Array, f2x: Array, f4x: Array, init_disp: Array,
                 *, train: bool = False) -> tuple[Array, Array]:
        up2 = PhUpStage2x(dtype=self.dtype, fuse_mixer=self.fuse_mixer,
                          wphase_mixer=self.wphase_mixer,
                          name="stage2x")(
            f1x, f2x, init_disp, train=train)
        up4 = PhUpStage4x(dtype=self.dtype, name="stage4x")(
            up2, f2x, f4x, train=train)
        return from_phases(up4, 4), from_phases(up2, 2)


# ---------------------------------------------------------------------------
# Generalised phase machinery: arbitrary phase depth (covers Upsample8/16)
# ---------------------------------------------------------------------------


class PhPixelShuffleUpG(nn.Module):
    """PixelShuffleUp with arbitrary shuffle factor in phase space."""

    dim: int
    in_channels: int
    factor: int
    p_in: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        r, co, ci, p = self.factor, self.dim, self.in_channels, self.p_in
        bound = float(1.0 / np.sqrt(ci))

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w, b = _KernelParams((1, 1, ci, co * r * r), uinit, bias=True,
                             bias_init=uinit, name="conv")()
        idx = _shuffle_perm_idx(co, r, p)
        y = phase_conv(x, w, "conv", 0, p, p, dtype=self.dtype, out_perm=idx)
        y = y + jnp.tile(b, p * p)[idx].astype(y.dtype)
        return jax.nn.silu(y)


def _fine_bilinear(disp_ph: Array, p_in: int, scale: int) -> Array:
    """Bilinear x``scale`` of a 1-channel phased disparity via a fine-level
    round trip (cheap: single-channel tensors)."""
    fine = from_phases(disp_ph, p_in) if p_in > 1 else disp_ph
    h, w = fine.shape[1] * scale, fine.shape[2] * scale
    up = ops.resize_bilinear(fine, (h, w))
    return to_phases(up, p_in * scale)


class PhUpRefinementG(nn.Module):
    """UpRefinement at arbitrary disparity phase depth ``p`` (power of 2).

    Levels run at phases p, p/2, p/4, p/8; once phases hit 1 the remaining
    levels use plain spatial stride-2 convs below the base grid (with the
    reference's deconv crop). ``f1`` joins at the conv2 level, ``f2`` at
    the conv1 level; their phase counts must match those levels.
    """

    channels: int
    p: int
    f1_phases: int
    f1_channels: int
    f2_phases: int
    f2_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, disp_ph: Array, f1: Array, f2: Array,
                 *, train: bool = False) -> Array:
        c, p0 = self.channels, self.p
        dt = self.dtype

        def down(x, cin, p_in, name):
            """stride-2 conv pair entering the next level."""
            if p_in > 1:
                y = PhConvBlock(c, cin, 3, 1, p_in, p_in // 2, dtype=dt,
                                name=f"{name}_0")(x, train=train)
                p_out = p_in // 2
                y2 = PhConvBlock(c, c, 3, 1, p_out, p_out, dtype=dt,
                                 name=f"{name}_1")(y, train=train)
            else:
                y = ConvBlock(c, 3, 2, 1, dtype=dt,
                              name=f"{name}_0")(x, train=train)
                p_out = 1
                y2 = ConvBlock(c, 3, 1, 1, dtype=dt,
                               name=f"{name}_1")(y, train=train)
            return y2, p_out

        conv1, p1 = down(disp_ph, 1, p0, "conv1")
        conv2, p2 = down(conv1, c, p1, "conv2")
        conv3, p3 = down(conv2, c, p2, "conv3")

        def up(x, p_in, p_target, target, name, features, bn=True,
               act="gelu"):
            """deconv k4 s2 back up one level (phase or spatial)."""
            if p_target > p_in or p_in > 1:
                return PhConvBlock(features, c, 4, 1, p_in, p_in * 2,
                                   mode="deconv", bn=bn, act=act, dtype=dt,
                                   name=name)(x, train=train)
            y = ConvBlock(features, 4, 2, 1, deconv=True, bn=bn, act=act,
                          dtype=dt, name=name)(x, train=train)
            if target is not None:
                y = y[:, :target.shape[1], :target.shape[2]]
            return y

        # conv3 -> conv2 level
        if p3 == p2:  # spatial stride below base: plain deconv + crop
            conv3_up = up(conv3, 1, 1, conv2, "conv3_up", c)
        else:
            conv3_up = PhConvBlock(c, c, 4, 1, p3, p2, mode="deconv",
                                   dtype=dt, name="conv3_up")(
                conv3, train=train)
        assert self.f1_phases == p2, (self.f1_phases, p2)
        if p2 == 1:
            cat2 = jnp.concatenate([conv3_up, conv2, f1], axis=-1)
            agg = ConvBlock(c, 1, 1, 0, dtype=dt, name="agg_0_0")(
                cat2, train=train)
            conv2m = ConvBlock(c, 3, 1, 1, dtype=dt, name="agg_0_1")(
                agg, train=train)
        else:
            cat2, perm2 = _cat_perm(p2, conv3_up, c, conv2, c,
                                    f1, self.f1_channels)
            agg = PhConvBlock(c, 2 * c + self.f1_channels, 1, 0, p2, p2,
                              in_perm=perm2, dtype=dt,
                              name="agg_0_0")(cat2, train=train)
            conv2m = PhConvBlock(c, c, 3, 1, p2, p2, dtype=dt,
                                 name="agg_0_1")(agg, train=train)

        # conv2 -> conv1 level
        if p1 == p2:  # spatial
            conv2_up = up(conv2m, 1, 1, None, "conv2_up", c)
        else:
            conv2_up = PhConvBlock(c, c, 4, 1, p2, p1, mode="deconv",
                                   dtype=dt, name="conv2_up")(
                conv2m, train=train)
        assert self.f2_phases == p1, (self.f2_phases, p1)
        if p1 == 1:
            cat1 = jnp.concatenate([conv2_up, conv1, f2], axis=-1)
            agg1 = ConvBlock(c, 1, 1, 0, dtype=dt, name="agg_1_0")(
                cat1, train=train)
            conv1m = ConvBlock(c, 3, 1, 1, dtype=dt, name="agg_1_1")(
                agg1, train=train)
        else:
            cat1, perm1 = _cat_perm(p1, conv2_up, c, conv1, c,
                                    f2, self.f2_channels)
            agg1 = PhConvBlock(c, 2 * c + self.f2_channels, 1, 0, p1, p1,
                               in_perm=perm1, dtype=dt,
                               name="agg_1_0")(cat1, train=train)
            conv1m = PhConvBlock(c, c, 3, 1, p1, p1, dtype=dt,
                                 name="agg_1_1")(agg1, train=train)

        return PhConvBlock(1, c, 4, 1, p1, p0, mode="deconv", bn=False,
                           act=None, dtype=dt, name="conv1_up")(
            conv1m, train=train)


class PhUpStageG(nn.Module):
    """Generalised phase-folded _UpStage (see esmstereo._UpStage)."""

    dm_ch: int
    spx_out: int
    n_feats: int
    shuffle: int
    ref_ch: int
    use_mixer: bool
    p: int                # disparity input phases (1 = plain base grid)
    fuse_ch: int
    f1_phases: int
    f1_channels: int
    f2_phases: int
    f2_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, disp_ph: Array, fuse_ph: Array, f1: Array, f2: Array,
                 *, train: bool = False) -> Array:
        from esmstereo_tpu.models.esmstereo import DispFeatures, SpxBlock
        from esmstereo_tpu.nn.blocks import TorchConv
        from esmstereo_tpu.nn.shufflemixer import FMBlock

        dt, p = self.dtype, self.p
        if p == 1:
            d = DispFeatures(self.dm_ch, dtype=dt, name="dm")(
                disp_ph, train=train)
            x = SpxBlock(self.dm_ch, self.spx_out, dtype=dt, name="spx")(
                jnp.concatenate([d, fuse_ph], axis=-1), train=train)
        else:
            d = PhDispFeatures(self.dm_ch, p, dtype=dt, name="dm")(
                disp_ph, train=train)
            fused, fperm = _cat_perm(p, d, self.dm_ch, fuse_ph, self.fuse_ch)
            x = PhSpx(self.dm_ch, self.spx_out, self.dm_ch + self.fuse_ch,
                      p, in_perm=fperm, dtype=dt, name="spx")(
                fused, train=train)
        if self.use_mixer:
            assert p == 1
            x = TorchConv(self.n_feats, 3, 1, 1, dtype=dt, name="to_feat")(x)
            x = FMBlock(self.n_feats, 7, 2, dtype=dt, name="block0")(x)
            x = FMBlock(self.n_feats, 7, 2, dtype=dt, name="block1")(x)
        x = PhPixelShuffleUpG(self.n_feats, x.shape[-1] // max(p * p, 1),
                              self.shuffle, p, dtype=dt, name="up")(x)
        p_out = p * self.shuffle
        x = PhConv(1, self.n_feats, 3, 1, p_out, p_out, use_bias=True,
                   flat=True, dtype=dt, name="tail")(x)
        x = PhUpRefinementG(self.ref_ch, p_out, self.f1_phases,
                            self.f1_channels, self.f2_phases,
                            self.f2_channels, dtype=dt, name="ref")(
            x, f1, f2, train=train)
        return _fine_bilinear(disp_ph, p, self.shuffle) + x


class PhUpsample8(nn.Module):
    """Phase-folded twin of ``Upsample8`` (cv8 / M variant, eval path)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, f2x: Array, f4x: Array, f8x: Array, stem2: Array,
                 init_disp: Array, *, train: bool = False):
        dt = self.dtype
        # base grid = 1/8. f2x: x16' @1/16 (sub-base plain); f4x: x8' @base;
        # f8x: x4 raw @1/4 (p2); stem2 @1/2 (p4).
        f8x_ph = to_phases(f8x, 2)
        stem_ph = to_phases(stem2, 4)
        up2 = PhUpStageG(16, 16, 8, 2, 16, True, 1, f4x.shape[-1],
                         1, f2x.shape[-1], 1, f4x.shape[-1], dtype=dt,
                         name="stage2x")(
            init_disp, f4x, f2x, f4x, train=train)
        up4 = PhUpStageG(16, 8, 8, 2, 16, False, 2, f8x.shape[-1],
                         1, f4x.shape[-1], 2, f8x.shape[-1], dtype=dt,
                         name="stage4x")(
            up2, f8x_ph, f4x, f8x_ph, train=train)
        up8 = PhUpStageG(16, 8, 8, 2, 16, False, 4, stem2.shape[-1],
                         2, f8x.shape[-1], 4, stem2.shape[-1], dtype=dt,
                         name="stage8x")(
            up4, stem_ph, f8x_ph, stem_ph, train=train)
        return (from_phases(up8, 8), from_phases(up4, 4),
                from_phases(up2, 2))


class PhUpsample16(nn.Module):
    """Phase-folded twin of ``Upsample16`` (cv16 / S variant, eval path)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, f1x: Array, f2x: Array, f4x: Array, f8x: Array,
                 init_disp: Array, *, train: bool = False):
        dt = self.dtype
        # base grid = 1/16. f1x: x8 feats @1/8 (p2); f2x: f2 conv @base;
        # f4x: x4 feats @1/4 (p4); f8x: f0 conv @1/2 (p8).
        f1x_ph = to_phases(f1x, 2)
        f4x_ph = to_phases(f4x, 4)
        f8x_ph = to_phases(f8x, 8)
        up2 = PhUpStageG(16, 16, 8, 4, 16, True, 1, f2x.shape[-1],
                         1, f2x.shape[-1], 2, f1x.shape[-1], dtype=dt,
                         name="stage2x")(
            init_disp, f2x, f2x, f1x_ph, train=train)
        up4 = PhUpStageG(16, 8, 8, 4, 16, False, 4, f4x.shape[-1],
                         4, f4x.shape[-1], 8, f8x.shape[-1], dtype=dt,
                         name="stage4x")(
            up2, f4x_ph, f4x_ph, f8x_ph, train=train)
        return from_phases(up4, 16), from_phases(up2, 4)
