"""timm fence (round 5, VERDICT r4 #8): the offline-checkable facts.

No timm wheel and zero egress mean backbone parity is proven against
tests/timm_stub; these tests pin the vendored architecture facts in
backbones/efficientnet.py so the stub and the Flax side cannot BOTH
encode timm wrong on anything derivable from published rules.
"""

import flax.linen as nn
import numpy as np
import pytest

from esmstereo_tpu.backbones import ARCHS
from esmstereo_tpu.backbones import efficientnet as effmod
from esmstereo_tpu.backbones.efficientnet import (
    EFFICIENTNET_B2,
    MOBILENETV2_100,
    TIMM_BN_EPS,
    TIMM_BN_MOMENTUM,
    derive_efficientnet_table,
    round_channels,
)


def test_b2_table_derives_from_b0():
    """EFFICIENTNET_B2 must equal the b0 table compound-scaled by
    timm's published rules (width 1.1 via round_channels divisor 8,
    depth 1.2 via ceil) — a typo'd channel count cannot survive this."""
    derived = derive_efficientnet_table(width=1.1, depth=1.2)
    assert derived.stem_chs == EFFICIENTNET_B2.stem_chs
    assert derived.chans == EFFICIENTNET_B2.chans
    assert len(derived.stages) == len(EFFICIENTNET_B2.stages)
    for ds, vs in zip(derived.stages, EFFICIENTNET_B2.stages):
        assert len(ds) == len(vs), (ds, vs)
        for db, vb in zip(ds, vs):
            assert (db.kind, db.out_chs, db.kernel, db.stride,
                    db.expand, db.se_ratio) == \
                   (vb.kind, vb.out_chs, vb.kernel, vb.stride,
                    vb.expand, vb.se_ratio)


def test_round_channels_matches_published_points():
    # the published b0->b2 width-1.1 mappings
    for c0, c2 in ((16, 16), (24, 24), (40, 48), (80, 88), (112, 120),
                   (192, 208), (32, 32)):
        assert round_channels(c0, 1.1) == c2, (c0, c2)


def test_se_rounding_ambiguity_is_moot():
    """rd = f(in_chs * 0.25): every b2 block input is a multiple of 4,
    so int / round / make_divisible(8, with 90% fallback) coincide —
    the cross-timm-version formula ambiguity cannot change this arch."""
    in_chs = EFFICIENTNET_B2.stem_chs
    for stage in EFFICIENTNET_B2.stages:
        for b in stage:
            assert in_chs % 4 == 0, in_chs
            exact = in_chs * 0.25
            assert int(exact) == round(exact) == exact
            in_chs = b.out_chs


def test_bn_constants_match_torch_defaults():
    """The Flax BN must implement torch BatchNorm2d defaults: eps 1e-5,
    momentum 0.1 (flax running-average momentum = 1 - torch)."""
    bn = effmod._bn(train=True, dtype=None, name="bn")
    assert bn.epsilon == TIMM_BN_EPS
    assert bn.momentum == pytest.approx(1.0 - TIMM_BN_MOMENTUM)


def test_padding_rule_symmetric_k_half():
    """Non-tf_ timm models pad Conv2d symmetrically by k//2; every
    backbone block must use that rule (TorchConv padding == k // 2)."""
    for arch in ("mobilenetv2_100", "efficientnet_b2"):
        for stage in ARCHS[arch].stages:
            for b in stage:
                assert b.kernel // 2 in (1, 2)  # k in {3, 5}


def test_mobilenetv2_table_matches_paper():
    """MobileNetV2's (t, c, n, s) table (Sandler et al. 2018, Table 2),
    width 1.0 — blocks.6 (320) excluded like the reference's slice."""
    paper = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
    )
    assert len(MOBILENETV2_100.stages) == len(paper)
    for stage, (t, c, n, s) in zip(MOBILENETV2_100.stages, paper):
        assert len(stage) == n
        assert stage[0].expand == t and stage[0].out_chs == c
        assert stage[0].stride == s
        for b in stage[1:]:
            assert b.stride == 1
        assert all(b.se_ratio == 0.0 for b in stage)  # V2 has no SE
