"""Fused backbone-stage kernel vs the plain block modules (shared params)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.backbones.efficientnet import (
    ARCHS,
    DepthwiseSeparable,
    InvertedResidual,
)
from esmstereo_tpu.attic import fused_stage as fs


def _plain_stage(arch: str, si: int) -> nn.Module:
    acfg = ARCHS[arch]

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            for bi, bcfg in enumerate(acfg.stages[si]):
                cls = (DepthwiseSeparable if bcfg.kind == "ds"
                       else InvertedResidual)
                x = cls(bcfg, acfg.act, name=f"blocks_{si}_{bi}")(
                    x, train=train)
            return x

    return Stage()


CASES = [
    # (arch, stage, input shape): covers stride-2 k3 + SE (effb2 stage1),
    # stride-2 k5 + SE (stage2), no-SE stride-2 chain (mnv2 stage1), and a
    # stride-1-entry residual chain (mnv2 stage4)
    ("efficientnet_b2", 1, (2, 32, 64, 16)),
    ("efficientnet_b2", 2, (2, 16, 32, 24)),
    ("mobilenetv2_100", 1, (1, 32, 64, 16)),
    ("mobilenetv2_100", 4, (1, 16, 16, 96)),
]


@pytest.mark.parametrize("arch,si,shape", CASES)
def test_fused_stage_matches_plain(rng, arch, si, shape):
    acfg = ARCHS[arch]
    stage = acfg.stages[si]
    assert fs.stage_supported(stage, shape[-1], shape[2], shape[1])
    mod = _plain_stage(arch, si)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = mod.init(jax.random.key(0), x, train=False)
    want = mod.apply(v, x, train=False)
    consts = fs.prepare_stage_consts(
        v["params"], v["batch_stats"], si=si, stage=stage, cin=shape[-1],
        w_out=shape[2] // stage[0].stride, act=acfg.act)
    got = fs.fused_stage_apply(x, consts, tile_rows=8, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_stage_odd_height(rng):
    """H not divisible by the tile: validity masks must keep edges exact
    (effb2 deployment has H/16 = 34 rows at stage 3)."""
    arch, si, shape = "efficientnet_b2", 1, (1, 40, 64, 16)  # h_out = 20
    acfg = ARCHS[arch]
    stage = acfg.stages[si]
    mod = _plain_stage(arch, si)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = mod.init(jax.random.key(0), x, train=False)
    want = mod.apply(v, x, train=False)
    consts = fs.prepare_stage_consts(
        v["params"], v["batch_stats"], si=si, stage=stage, cin=shape[-1],
        w_out=shape[2] // 2, act=acfg.act)
    got = fs.fused_stage_apply(x, consts, tile_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stage_supported_rejects_bad_widths():
    acfg = ARCHS["efficientnet_b2"]
    # effb2 stage3 at deployment width: out 88 channels * 60 px not
    # lane-aligned
    assert not fs.stage_supported(acfg.stages[3], 48, 120, 68)
    # stage2 at deployment width IS supported (w_in*cin = 240*24)
    assert fs.stage_supported(acfg.stages[2], 24, 240, 136)
