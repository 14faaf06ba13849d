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
