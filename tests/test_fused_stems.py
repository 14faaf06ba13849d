"""Fused stem_2/stem_4 kernel, module params, and model parity."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.models.esmstereo import ESMStereo, ESMStereoConfig
from esmstereo_tpu.nn.blocks import StemBlock
from esmstereo_tpu.ops.pallas import fused_stems as fst


class PlainStems(nn.Module):
    f2: int = 32
    f4: int = 48

    @nn.compact
    def __call__(self, x, *, train=False):
        s2 = StemBlock(self.f2, name="stem_2")(x, train=train)
        s4 = StemBlock(self.f4, name="stem_4")(s2, train=train)
        return s2, s4


@pytest.mark.parametrize("f2,f4,shape", [
    (32, 48, (2, 64, 96, 3)),    # cv4/cv8 widths
    (16, 24, (2, 64, 128, 3)),   # cv16 widths
    (32, 48, (1, 48, 64, 3)),    # odd tile count, batch 1
])
def test_fused_stems_kernel_matches_plain(rng, f2, f4, shape):
    assert fst.stems_supported(shape[1], shape[2], f2, f4)
    mod = PlainStems(f2, f4)
    img = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = mod.init(jax.random.key(0), img, train=False)
    w2, w4 = mod.apply(v, img, train=False)
    consts = fst.prepare_stems_consts(v["params"], v["batch_stats"],
                                      w_img=shape[2], f2=f2, f4=f4)
    g2, g4 = fst.fused_stems_apply(img, consts, tile_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(w4),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cv_scale", [4, 16])
def test_model_with_fused_stems_matches(rng, cv_scale):
    """fuse_stems param tree and (CPU fallback) outputs match plain."""
    base = dict(cv_scale=cv_scale, backbone="mobilenetv2_100",
                use_pallas=False)
    m_ref = ESMStereo(config=ESMStereoConfig(fuse_stems=False, **base))
    m_f = ESMStereo(config=ESMStereoConfig(fuse_stems=True, **base))
    left = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    v = m_ref.init(jax.random.key(0), left, right, train=False)
    v2 = m_f.init(jax.random.key(1), left, right, train=False)
    paths = lambda vv: {
        (k, jax.tree_util.keystr(p), tuple(l.shape))
        for k in vv
        for p, l in jax.tree_util.tree_flatten_with_path(vv[k])[0]}
    assert paths(v2) == paths(v)
    want = m_ref.apply(v, left, right, train=False)[0]
    got = m_f.apply(v, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
