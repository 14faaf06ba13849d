"""Phase-folded backbone towers vs the plain modules (shared params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.backbones import FeaturePyramid
from esmstereo_tpu.backbones.phased import (
    PhasedFeaturePyramid,
    PhasedStemBlock,
)
from esmstereo_tpu.models.esmstereo import ESMStereo, ESMStereoConfig
from esmstereo_tpu.nn.blocks import StemBlock
from esmstereo_tpu.nn.phasefold import to_phases


@pytest.mark.parametrize("arch", ["mobilenetv2_100", "efficientnet_b2"])
def test_phased_pyramid_matches_plain(rng, arch):
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)), jnp.float32)
    plain = FeaturePyramid(arch=arch)
    phased = PhasedFeaturePyramid(arch=arch)
    variables = plain.init(jax.random.key(0), x, train=False)
    want = plain.apply(variables, x, train=False)
    got = phased.apply(variables, x, train=False)
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)


def test_phased_pyramid_param_tree_matches(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    plain = FeaturePyramid(arch="efficientnet_b2")
    phased = PhasedFeaturePyramid(arch="efficientnet_b2")
    v_plain = plain.init(jax.random.key(0), x, train=False)
    v_ph = phased.init(jax.random.key(0), x, train=False)
    paths = lambda v: {
        (k, jax.tree_util.keystr(p), tuple(l.shape))
        for k in v
        for p, l in jax.tree_util.tree_flatten_with_path(v[k])[0]}
    assert paths(v_ph) == paths(v_plain)


def test_phased_stems_match_plain(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)

    import flax.linen as nn

    class PlainStems(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            s2 = StemBlock(32, name="stem_2")(x, train=train)
            s4 = StemBlock(48, name="stem_4")(s2, train=train)
            return s2, s4

    class PhasedStems(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            xp = to_phases(x, 4)
            s2p = PhasedStemBlock(32, 3, 4, name="stem_2")(xp, train=train)
            s4 = PhasedStemBlock(48, 32, 2, name="stem_4")(s2p, train=train)
            from esmstereo_tpu.nn.phasefold import from_phases
            return from_phases(s2p, 2), s4

    plain, phased = PlainStems(), PhasedStems()
    variables = plain.init(jax.random.key(0), x, train=False)
    w2, w4 = plain.apply(variables, x, train=False)
    g2, g4 = phased.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(w4),
                               rtol=1e-4, atol=1e-4)


def test_full_model_with_phased_towers(rng):
    base = dict(cv_scale=4, backbone="mobilenetv2_100", use_pallas=False,
                phase_fold_upsample=False)
    m_ref = ESMStereo(config=ESMStereoConfig(phase_fold_towers=False, **base))
    m_ph = ESMStereo(config=ESMStereoConfig(phase_fold_towers=True, **base))
    left = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    variables = m_ref.init(jax.random.key(0), left, right, train=False)
    want = m_ref.apply(variables, left, right, train=False)[0]
    got = m_ph.apply(variables, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=5e-3)
