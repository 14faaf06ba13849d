"""EfficientNet-family feature-pyramid backbones (MobileNetV2 / EfficientNet-B2).

Ground-up NHWC Flax implementation of the two timm feature extractors the
reference wraps (``/root/reference/models/ESMStereo.py:40-77``):

  * ``mobilenetv2_100``  — pyramid channels [16, 24, 32, 96, 160]
  * ``efficientnet_b2``  — pyramid channels [16, 24, 48, 120, 208]

The reference slices ``model.blocks`` at layer boundaries [1, 2, 3, 5, 6] and
returns five feature maps at strides /2 /4 /8 /16 /32; the final stage
(blocks[6]) is never executed, so it is not built here. Note the reference
replaces the stem activation with ReLU6 for *both* backbones
(``ESMStereo.py:51,60``) — we keep that behaviour.

Module/parameter naming mirrors timm's state_dict layout
(``conv_stem``, ``bn1``, ``blocks.{stage}.{idx}.conv_pw/bn1/...``) so that
``convert_timm.py`` can map pretrained ImageNet weights mechanically.

Init follows timm's ``_init_weight_goog``: conv weights ~
Normal(0, sqrt(2/fan_out)), BN gamma=1 beta=0.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from esmstereo_tpu.nn.blocks import TorchConv, apply_act

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    kind: str          # 'ds' (depthwise-separable) or 'ir' (inverted residual)
    out_chs: int
    kernel: int
    stride: int
    expand: int = 6
    se_ratio: float = 0.0


@dataclasses.dataclass(frozen=True)
class ArchCfg:
    stem_chs: int
    act: str
    stages: tuple[tuple[BlockCfg, ...], ...]
    chans: tuple[int, ...]  # pyramid channels at /2 /4 /8 /16 /32


def _stage(cfg: BlockCfg, repeats: int) -> tuple[BlockCfg, ...]:
    blocks = [cfg]
    for _ in range(repeats - 1):
        blocks.append(dataclasses.replace(cfg, stride=1))
    return tuple(blocks)


MOBILENETV2_100 = ArchCfg(
    stem_chs=32,
    act="relu6",
    stages=(
        _stage(BlockCfg("ds", 16, 3, 1, 1), 1),
        _stage(BlockCfg("ir", 24, 3, 2), 2),
        _stage(BlockCfg("ir", 32, 3, 2), 3),
        _stage(BlockCfg("ir", 64, 3, 2), 4),
        _stage(BlockCfg("ir", 96, 3, 1), 3),
        _stage(BlockCfg("ir", 160, 3, 2), 3),
    ),
    chans=(16, 24, 32, 96, 160),
)

EFFICIENTNET_B2 = ArchCfg(
    stem_chs=32,
    act="silu",
    stages=(
        _stage(BlockCfg("ds", 16, 3, 1, 1, se_ratio=0.25), 2),
        _stage(BlockCfg("ir", 24, 3, 2, se_ratio=0.25), 3),
        _stage(BlockCfg("ir", 48, 5, 2, se_ratio=0.25), 3),
        _stage(BlockCfg("ir", 88, 3, 2, se_ratio=0.25), 4),
        _stage(BlockCfg("ir", 120, 5, 1, se_ratio=0.25), 4),
        _stage(BlockCfg("ir", 208, 5, 2, se_ratio=0.25), 5),
    ),
    chans=(16, 24, 48, 120, 208),
)

ARCHS = {
    "mobilenetv2_100": MOBILENETV2_100,
    "efficientnet_b2": EFFICIENTNET_B2,
}


# --- timm fence: vendored architecture facts (round 5, VERDICT r4 #8) ----
#
# Backbone parity is proven against tests/timm_stub (no timm wheel, zero
# egress), so the stub and this file could both encode timm wrong. The
# facts below pin everything that is checkable OFFLINE, as explicit data
# with derivations where the upstream rule is published:
#
#   * bn_eps / bn_momentum: timm's (non-tf_) efficientnet/mobilenetv2 use
#     torch BatchNorm2d defaults eps=1e-5, momentum=0.1. Flax's running-
#     average convention is inverted: flax momentum = 1 - torch momentum
#     = 0.9 (see _bn below; tests/test_timm_fence.py asserts both).
#   * padding: non-tf_ timm models build Conv2d with SYMMETRIC padding
#     k//2 (TorchConv's rule). Only tf_-prefixed variants use TF SAME
#     asymmetric padding — the reference loads plain 'efficientnet_b2' /
#     'mobilenetv2_100' (ESMStereo.py:46,55), so SAME-pad asymmetry is
#     NOT in play.
#   * SE reduced channels: rd = round(block INPUT chans * 0.25). For
#     every b2 block in_chs is a multiple of 4 (32,16,24,48,88,120), so
#     int()/round()/make_divisible(...,8 with fallback) all coincide —
#     the formula ambiguity across timm versions is structurally moot
#     for THIS arch (asserted in tests/test_timm_fence.py).
#   * the efficientnet_b2 table derives from the published b0 table via
#     timm's compound-scaling rules (width 1.1 through round_channels /
#     make_divisible(divisor=8), depth 1.2 through ceil) — encoded
#     executably in derive_efficientnet_table() and asserted equal to
#     EFFICIENTNET_B2 by the test, so a typo'd channel count cannot
#     survive.
#
# What remains UNVERIFIABLE offline (the residual risk, enumerated):
#   1. actual pretrained weight VALUES (no checkpoint can be fetched);
#      convert_timm.py's tensor->tensor mapping is exercised only against
#      the stub's synthetic state_dict.
#   2. timm state_dict KEY naming drift across timm versions (the layout
#      documented in convert_timm.py matches timm 0.6-1.x).
#   3. future changes to timm defaults (eps, act layers) — the facts
#      above describe timm as of the reference's vintage.

EFFICIENTNET_B0_TABLE = (
    # (kind, out_chs, kernel, stride, expand, repeats) — the published
    # EfficientNet-B0 MBConv table (Tan & Le 2019, Table 1; timm
    # efficientnet.py _gen_efficientnet arch_def), SE 0.25 throughout.
    ("ds", 16, 3, 1, 1, 1),
    ("ir", 24, 3, 2, 6, 2),
    ("ir", 40, 5, 2, 6, 2),
    ("ir", 80, 3, 2, 6, 3),
    ("ir", 112, 5, 1, 6, 3),
    ("ir", 192, 5, 2, 6, 4),
    # blocks.6 ("ir", 320, 3, 1, 6, 1) exists in timm but the reference
    # slices blocks[:6] and never runs it — excluded here like everywhere.
)

TIMM_BN_EPS = 1e-5         # torch BatchNorm2d default (non-tf_ models)
TIMM_BN_MOMENTUM = 0.1     # torch convention; flax uses 1 - this


def round_channels(chs: float, multiplier: float = 1.0,
                   divisor: int = 8) -> int:
    """timm's round_channels / make_divisible (efficientnet_builder.py):
    scale then round to the nearest multiple of ``divisor``, never going
    below 90% of the scaled value."""
    chs *= multiplier
    rounded = max(divisor, int(chs + divisor / 2) // divisor * divisor)
    if rounded < 0.9 * chs:
        rounded += divisor
    return int(rounded)


def derive_efficientnet_table(width: float, depth: float,
                              stem_chs: int = 32) -> ArchCfg:
    """Apply timm's compound scaling to the b0 table (b2: 1.1/1.2)."""
    import math

    stages = []
    chans = []
    strides_seen = 2  # stem is /2
    for kind, c, k, s, e, r in EFFICIENTNET_B0_TABLE:
        out = round_channels(c, width)
        reps = int(math.ceil(r * depth))
        stages.append(_stage(
            BlockCfg(kind, out, k, s, expand=e, se_ratio=0.25), reps))
    # pyramid channels at /2 /4 /8 /16 /32 = stage outputs 0,1,2,4,5
    outs = [st[-1].out_chs for st in stages]
    chans = (outs[0], outs[1], outs[2], outs[4], outs[5])
    return ArchCfg(stem_chs=round_channels(stem_chs, width), act="silu",
                   stages=tuple(stages), chans=chans)


def _bn(train: bool, dtype, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class SqueezeExcite(nn.Module):
    """SE gate: global-avg-pool -> reduce conv -> act -> expand conv -> sigmoid."""

    reduced_chs: int
    act: str = "silu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gate = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = TorchConv(self.reduced_chs, 1, use_bias=True, init_mode="msra",
                         dtype=self.dtype, name="conv_reduce")(gate)
        gate = apply_act(gate, self.act)
        gate = TorchConv(x.shape[-1], 1, use_bias=True, init_mode="msra",
                         dtype=self.dtype, name="conv_expand")(gate)
        return x * jax.nn.sigmoid(gate)


class DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv: dw -> bn -> act [-> se] -> pw -> bn."""

    cfg: BlockCfg
    act: str
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        c = self.cfg
        in_chs = x.shape[-1]
        shortcut = x
        x = TorchConv(in_chs, c.kernel, c.stride, c.kernel // 2, groups=in_chs,
                      init_mode="msra", dtype=self.dtype, name="conv_dw")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = apply_act(x, self.act)
        if c.se_ratio > 0:
            x = SqueezeExcite(max(1, int(in_chs * c.se_ratio)), self.act,
                              dtype=self.dtype, name="se")(x)
        x = TorchConv(c.out_chs, 1, init_mode="msra", dtype=self.dtype,
                      name="conv_pw")(x)
        x = _bn(train, self.dtype, "bn2")(x)
        if c.stride == 1 and in_chs == c.out_chs:
            x = x + shortcut
        return x


class InvertedResidual(nn.Module):
    """timm InvertedResidual: pw-expand -> dw -> [se] -> pw-linear, residual."""

    cfg: BlockCfg
    act: str
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        c = self.cfg
        in_chs = x.shape[-1]
        shortcut = x
        mid = in_chs * c.expand
        x = TorchConv(mid, 1, init_mode="msra", dtype=self.dtype,
                      name="conv_pw")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = apply_act(x, self.act)
        x = TorchConv(mid, c.kernel, c.stride, c.kernel // 2, groups=mid,
                      init_mode="msra", dtype=self.dtype, name="conv_dw")(x)
        x = _bn(train, self.dtype, "bn2")(x)
        x = apply_act(x, self.act)
        if c.se_ratio > 0:
            x = SqueezeExcite(max(1, int(in_chs * c.se_ratio)), self.act,
                              dtype=self.dtype, name="se")(x)
        x = TorchConv(c.out_chs, 1, init_mode="msra", dtype=self.dtype,
                      name="conv_pwl")(x)
        x = _bn(train, self.dtype, "bn3")(x)
        if c.stride == 1 and in_chs == c.out_chs:
            x = x + shortcut
        return x


class FeaturePyramid(nn.Module):
    """Five-level feature pyramid: [x2, x4, x8, x16, x32].

    Equivalent of the reference ``Feature`` module (``ESMStereo.py:40-77``)
    with its blocks[0:1]/[1:2]/[2:3]/[3:5]/[5:6] stage grouping.
    """

    arch: str = "efficientnet_b2"
    dtype: Any = None

    @property
    def chans(self) -> tuple[int, ...]:
        return ARCHS[self.arch].chans

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> list[Array]:
        cfg = ARCHS[self.arch]
        x = TorchConv(cfg.stem_chs, 3, 2, 1, init_mode="msra",
                      dtype=self.dtype, name="conv_stem")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        # The reference swaps the stem act for ReLU6 on both backbones.
        x = apply_act(x, "relu6")

        feats = []
        for si, stage in enumerate(cfg.stages):
            for bi, bcfg in enumerate(stage):
                cls = DepthwiseSeparable if bcfg.kind == "ds" else InvertedResidual
                x = cls(bcfg, cfg.act, dtype=self.dtype,
                        name=f"blocks_{si}_{bi}")(x, train=train)
            # pyramid taps after stages 0,1,2,4,5 (stage 3 and 4 share /16)
            if si in (0, 1, 2, 4, 5):
                feats.append(x)
        return feats
