"""Phase-folded backbone towers (TPU fast path, eval mode).

The early EfficientNet/MobileNetV2 stages run at 1/2 resolution with
16-32 channels: every elementwise op (BN, SiLU, SE gating, residual adds)
uses 12-25% of the VPU's 128 lanes, and the depthwise convs lower to slow
grouped convolutions. Measured on v5e at 544x960 (batch-2 siamese): the
backbone costs 12.2 ms of a 24 ms frame, 3.4 ms of it in stage0's two
DS blocks alone.

Space-to-depth folds the fine grid into channel phases on the 1/4 base
grid (``nn.phasefold``), so stage0/1 tensors carry ``4*C`` lanes, the
depthwise convs become dense phase-mixing convs on the MXU, and every
elementwise op runs at full lane width. All transforms are exact (see
tests/test_phased_backbone.py); parameter trees are path-compatible with
``FeaturePyramid`` / ``StemBlock`` so the same checkpoint drives either
path.

MEASURED OUTCOME (v5e, 544x960, batch-2 siamese, fp32): net LOSS.
Isolated: pyramid 12.9 ms phased vs 12.5 plain (the densified depthwise
convs pay C x the MACs, dominated by the mid=96 stage-1 block); stems
1.7 vs 2.2 ms. Full model: 27.0 ms vs 23.0 ms plain — boundary
relayouts at the phase<->fine seams eat the residual win. Kept as an
opt-in experiment (``ESMStereoConfig.phase_fold_towers``, default
False); a future Pallas depthwise kernel could revisit the premise.

Reference mapping: the plain modules mirror timm blocks sliced by the
reference ``Feature`` (``/root/reference/models/ESMStereo.py:40-77``); the
stems mirror ``stem_*`` (``ESMStereo.py:529-583``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from esmstereo_tpu.backbones.efficientnet import ARCHS, BlockCfg
from esmstereo_tpu.backbones.efficientnet import (
    DepthwiseSeparable,
    InvertedResidual,
)
from esmstereo_tpu.nn import init as tinit
from esmstereo_tpu.nn.blocks import TorchConv, apply_act
from esmstereo_tpu.nn.folded3d import FoldedBatchNorm
from esmstereo_tpu.nn.phasefold import from_phases, phase_conv, to_phases
from esmstereo_tpu.models.phased_upsample import (
    PhConvBlock,
    _KernelParams,
    _add_phase_bias,
)

Array = jax.Array


def _densify_dw(w: Array) -> Array:
    """(k, k, 1, C) grouped depthwise kernel -> (k, k, C, C) with the
    per-channel taps on the diagonal. The dense phase conv wastes C x the
    MACs on structural zeros but runs on the MXU at full lanes — measured
    9x faster than the grouped lowering at C=32, 272x480."""
    k1, k2, _, c = w.shape
    eye = jnp.eye(c, dtype=w.dtype)
    return w[:, :, 0, :][:, :, None, :] * eye[None, None]


class PhasedSE(nn.Module):
    """SqueezeExcite on phase-major channels: the global-average gate over
    the fine grid equals the mean over (base H, base W, phases). Parameter
    paths match ``SqueezeExcite`` (conv_reduce / conv_expand)."""

    reduced_chs: int
    channels: int
    p: int
    act: str = "silu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import numpy as np

        b, h, w, pc = x.shape
        c, p = self.channels, self.p
        # per-channel mean over (H, W, phases) as a matmul with a static
        # phase-summing indicator: reshaping (..., p*p, C) to reduce would
        # split the lane dimension (a relayout copy on TPU)
        msum = np.tile(np.eye(c, dtype=np.float32), (p * p, 1)) / (
            h * w * p * p)
        gate = jnp.einsum("bnk,kc->bc", x.reshape(b, h * w, pc),
                          jnp.asarray(msum, x.dtype))[:, None, None, :]
        gate = TorchConv(self.reduced_chs, 1, use_bias=True, init_mode="msra",
                         dtype=self.dtype, name="conv_reduce")(gate)
        gate = apply_act(gate, self.act)
        gate = TorchConv(c, 1, use_bias=True, init_mode="msra",
                         dtype=self.dtype, name="conv_expand")(gate)
        g = jax.nn.sigmoid(gate)
        return x * jnp.tile(g, (1, 1, 1, p * p))


class PhasedDepthwiseSeparable(nn.Module):
    """Phase-space twin of ``DepthwiseSeparable`` (timm DS block)."""

    cfg: BlockCfg
    act: str
    p: int
    in_chs: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> tuple[Array, int]:
        c, p, cin = self.cfg, self.p, self.in_chs
        p_out = p // c.stride if c.stride > 1 else p
        shortcut = x
        w, _ = _KernelParams((c.kernel, c.kernel, 1, cin), tinit.msra_out,
                             name="conv_dw")()
        y = phase_conv(x, _densify_dw(w), "conv", c.kernel // 2, p, p_out,
                       dtype=self.dtype)
        y = FoldedBatchNorm(cin, use_running_average=not train,
                            dtype=self.dtype, name="bn1")(y)
        y = apply_act(y, self.act)
        if c.se_ratio > 0:
            y = PhasedSE(max(1, int(cin * c.se_ratio)), cin, p_out, self.act,
                         dtype=self.dtype, name="se")(y)
        w_pw, _ = _KernelParams((1, 1, cin, c.out_chs), tinit.msra_out,
                                name="conv_pw")()
        y = phase_conv(y, w_pw, "conv", 0, p_out, p_out, dtype=self.dtype)
        y = FoldedBatchNorm(c.out_chs, use_running_average=not train,
                            dtype=self.dtype, name="bn2")(y)
        if c.stride == 1 and cin == c.out_chs:
            y = y + shortcut
        return y, p_out


class PhasedInvertedResidual(nn.Module):
    """Phase-space twin of ``InvertedResidual`` (timm IR block)."""

    cfg: BlockCfg
    act: str
    p: int
    in_chs: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> tuple[Array, int]:
        c, p, cin = self.cfg, self.p, self.in_chs
        p_out = p // c.stride if c.stride > 1 else p
        mid = cin * c.expand
        shortcut = x
        w_pw, _ = _KernelParams((1, 1, cin, mid), tinit.msra_out,
                                name="conv_pw")()
        y = phase_conv(x, w_pw, "conv", 0, p, p, dtype=self.dtype)
        y = FoldedBatchNorm(mid, use_running_average=not train,
                            dtype=self.dtype, name="bn1")(y)
        y = apply_act(y, self.act)
        w_dw, _ = _KernelParams((c.kernel, c.kernel, 1, mid), tinit.msra_out,
                                name="conv_dw")()
        y = phase_conv(y, _densify_dw(w_dw), "conv", c.kernel // 2, p, p_out,
                       dtype=self.dtype)
        y = FoldedBatchNorm(mid, use_running_average=not train,
                            dtype=self.dtype, name="bn2")(y)
        y = apply_act(y, self.act)
        if c.se_ratio > 0:
            y = PhasedSE(max(1, int(cin * c.se_ratio)), mid, p_out, self.act,
                         dtype=self.dtype, name="se")(y)
        w_pwl, _ = _KernelParams((1, 1, mid, c.out_chs), tinit.msra_out,
                                 name="conv_pwl")()
        y = phase_conv(y, w_pwl, "conv", 0, p_out, p_out, dtype=self.dtype)
        y = FoldedBatchNorm(c.out_chs, use_running_average=not train,
                            dtype=self.dtype, name="bn3")(y)
        if c.stride == 1 and cin == c.out_chs:
            y = y + shortcut
        return y, p_out


class PhasedFeaturePyramid(nn.Module):
    """Phase-folded twin of ``FeaturePyramid`` (eval fast path).

    The stem and every block still at phase depth > 1 (i.e. above the 1/4
    base grid) run in phase space; once a stride-2 block lands on the base
    grid the remaining stages use the plain modules unchanged. Output
    pyramid is identical: fine-layout [x2, x4, x8, x16, x32].
    """

    arch: str = "efficientnet_b2"
    dtype: Any = None

    @property
    def chans(self) -> tuple[int, ...]:
        return ARCHS[self.arch].chans

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> list[Array]:
        cfg = ARCHS[self.arch]
        assert x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0, x.shape

        xp = to_phases(x, 4)
        w, _ = _KernelParams((3, 3, x.shape[-1], cfg.stem_chs),
                             tinit.msra_out, name="conv_stem")()
        y = phase_conv(xp, w, "conv", 1, 4, 2, dtype=self.dtype)
        y = FoldedBatchNorm(cfg.stem_chs, use_running_average=not train,
                            dtype=self.dtype, name="bn1")(y)
        # the reference swaps the stem act for ReLU6 on both backbones
        y = apply_act(y, "relu6")

        p = 2
        cin = cfg.stem_chs
        feats = []
        for si, stage in enumerate(cfg.stages):
            for bi, bcfg in enumerate(stage):
                name = f"blocks_{si}_{bi}"
                if p > 1:
                    cls = (PhasedDepthwiseSeparable if bcfg.kind == "ds"
                           else PhasedInvertedResidual)
                    y, p = cls(bcfg, cfg.act, p, cin, dtype=self.dtype,
                               name=name)(y, train=train)
                else:
                    cls = (DepthwiseSeparable if bcfg.kind == "ds"
                           else InvertedResidual)
                    y = cls(bcfg, cfg.act, dtype=self.dtype,
                            name=name)(y, train=train)
                cin = bcfg.out_chs
            if si in (0, 1, 2, 4, 5):
                feats.append(from_phases(y, p) if p > 1 else y)
        return feats


class PhasedStemBlock(nn.Module):
    """Phase-space twin of ``StemBlock`` (``stem_*``, ``ESMStereo.py:529-583``):
    ConvBlock(k3 s2) -> conv3x3 -> BN -> ReLU, from ``p_in`` to ``p_in/2``
    phases on the same base grid. Parameter paths match ``StemBlock``."""

    features: int
    in_channels: int
    p_in: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        p_out = self.p_in // 2
        x = PhConvBlock(self.features, self.in_channels, 3, 1, self.p_in,
                        p_out, dtype=self.dtype, name="conv_down")(
            x, train=train)
        w, b = _KernelParams((3, 3, self.features, self.features),
                             tinit.torch_conv_kernel, name="conv")()
        x = phase_conv(x, w, "conv", 1, p_out, p_out, dtype=self.dtype)
        x = FoldedBatchNorm(self.features, use_running_average=not train,
                            dtype=self.dtype, name="bn")(x)
        return jax.nn.relu(x)
