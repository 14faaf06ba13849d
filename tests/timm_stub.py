"""Minimal torch-side ``timm`` stand-in for importing the reference model.

timm is not installed in this environment, but the reference only uses
``timm.create_model(name, pretrained=True, features_only=True)`` and then
takes ``.conv_stem``, ``.bn1`` and ``.blocks`` off the result
(``/root/reference/models/ESMStereo.py:44-66``). This module builds those
three attributes with timm's exact module structure, forward semantics and
state_dict naming for the two backbones ESMStereo supports
(``mobilenetv2_100`` and ``efficientnet_b2``), so the reference network can
be constructed and run in torch for full-model parity tests.

The architecture tables are the published timm configurations (the same
ones ``esmstereo_tpu/backbones/efficientnet.py`` encodes on the Flax side);
the state_dict layout matches the real timm checkpoints
(conv_stem / bn1 / blocks.{stage}.{idx}.{conv_pw,bn1,conv_dw,bn2,se,...}).

Install before importing the reference::

    import sys, tests.timm_stub as timm_stub
    sys.modules["timm"] = timm_stub
"""

from __future__ import annotations

import dataclasses

import torch
import torch.nn as nn

__version__ = "0.0-stub"


@dataclasses.dataclass(frozen=True)
class _Block:
    kind: str           # 'ds' | 'ir'
    out_chs: int
    kernel: int
    stride: int
    expand: int = 6
    se_ratio: float = 0.0


def _stage(cfg: _Block, repeats: int) -> list[_Block]:
    return [cfg] + [dataclasses.replace(cfg, stride=1)
                    for _ in range(repeats - 1)]


_ARCHS = {
    "mobilenetv2_100": dict(
        stem_chs=32,
        act=nn.ReLU6,
        stages=[
            _stage(_Block("ds", 16, 3, 1, 1), 1),
            _stage(_Block("ir", 24, 3, 2), 2),
            _stage(_Block("ir", 32, 3, 2), 3),
            _stage(_Block("ir", 64, 3, 2), 4),
            _stage(_Block("ir", 96, 3, 1), 3),
            _stage(_Block("ir", 160, 3, 2), 3),
            # final stage (ESMStereo never runs it, but timm has it and the
            # reference slices blocks[5:6], so >=6 stages suffice; keep a
            # 7th to mirror timm's count for robustness)
            _stage(_Block("ir", 320, 3, 1), 1),
        ],
    ),
    "efficientnet_b2": dict(
        stem_chs=32,
        act=nn.SiLU,
        stages=[
            _stage(_Block("ds", 16, 3, 1, 1, se_ratio=0.25), 2),
            _stage(_Block("ir", 24, 3, 2, se_ratio=0.25), 3),
            _stage(_Block("ir", 48, 5, 2, se_ratio=0.25), 3),
            _stage(_Block("ir", 88, 3, 2, se_ratio=0.25), 4),
            _stage(_Block("ir", 120, 5, 1, se_ratio=0.25), 4),
            _stage(_Block("ir", 208, 5, 2, se_ratio=0.25), 5),
            _stage(_Block("ir", 352, 3, 1, se_ratio=0.25), 2),
        ],
    ),
}


class SqueezeExcite(nn.Module):
    """timm SE: mean-pool -> conv_reduce -> act -> conv_expand -> sigmoid gate."""

    def __init__(self, chs: int, rd_chs: int, act) -> None:
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd_chs, 1, bias=True)
        self.act1 = act()
        self.conv_expand = nn.Conv2d(rd_chs, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act1(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class DepthwiseSeparableConv(nn.Module):
    """timm DS block: dw -> bn1 -> act [-> se] -> pw -> bn2 (+residual)."""

    def __init__(self, in_chs: int, cfg: _Block, act) -> None:
        super().__init__()
        self.has_residual = cfg.stride == 1 and in_chs == cfg.out_chs
        self.conv_dw = nn.Conv2d(in_chs, in_chs, cfg.kernel, cfg.stride,
                                 cfg.kernel // 2, groups=in_chs, bias=False)
        self.bn1 = nn.BatchNorm2d(in_chs)
        self.act1 = act()
        if cfg.se_ratio > 0:
            self.se = SqueezeExcite(in_chs, max(1, int(in_chs * cfg.se_ratio)),
                                    act)
        else:
            self.se = nn.Identity()
        self.conv_pw = nn.Conv2d(in_chs, cfg.out_chs, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cfg.out_chs)

    def forward(self, x):
        shortcut = x
        x = self.act1(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn2(self.conv_pw(x))
        if self.has_residual:
            x = x + shortcut
        return x


class InvertedResidual(nn.Module):
    """timm IR block: pw-expand -> dw -> [se] -> pw-linear (+residual).

    The SE reduction width is computed from the block *input* channels
    (timm convention), applied on the expanded mid channels.
    """

    def __init__(self, in_chs: int, cfg: _Block, act) -> None:
        super().__init__()
        mid = in_chs * cfg.expand
        self.has_residual = cfg.stride == 1 and in_chs == cfg.out_chs
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.act1 = act()
        self.conv_dw = nn.Conv2d(mid, mid, cfg.kernel, cfg.stride,
                                 cfg.kernel // 2, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.act2 = act()
        if cfg.se_ratio > 0:
            self.se = SqueezeExcite(mid, max(1, int(in_chs * cfg.se_ratio)),
                                    act)
        else:
            self.se = nn.Identity()
        self.conv_pwl = nn.Conv2d(mid, cfg.out_chs, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cfg.out_chs)

    def forward(self, x):
        shortcut = x
        x = self.act1(self.bn1(self.conv_pw(x)))
        x = self.act2(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        if self.has_residual:
            x = x + shortcut
        return x


class _FeaturesModel(nn.Module):
    def __init__(self, name: str) -> None:
        super().__init__()
        arch = _ARCHS[name]
        act = arch["act"]
        self.conv_stem = nn.Conv2d(3, arch["stem_chs"], 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(arch["stem_chs"])
        self.act1 = act()
        stages = []
        in_chs = arch["stem_chs"]
        for stage in arch["stages"]:
            blocks = []
            for b in stage:
                cls = (DepthwiseSeparableConv if b.kind == "ds"
                       else InvertedResidual)
                blocks.append(cls(in_chs, b, act))
                in_chs = b.out_chs
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x):  # not used by the reference, provided for sanity
        x = self.act1(self.bn1(self.conv_stem(x)))
        return self.blocks(x)


def create_model(name: str, pretrained: bool = False,
                 features_only: bool = False, **kwargs) -> nn.Module:
    """Stand-in for ``timm.create_model``.

    ``pretrained`` is accepted and ignored (no network access here; parity
    tests transplant the random-init weights both ways anyway).
    """
    if name not in _ARCHS:
        raise ValueError(f"timm stub only provides {sorted(_ARCHS)}, "
                         f"not {name!r}")
    return _FeaturesModel(name)
