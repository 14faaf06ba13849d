"""Fused stem+stage0 head: kernel (interpret), module, and model parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.backbones import FeaturePyramid
from esmstereo_tpu.backbones.efficientnet import ARCHS
from esmstereo_tpu.backbones.fused import FusedHeadPyramid
from esmstereo_tpu.models.esmstereo import ESMStereo, ESMStereoConfig
from esmstereo_tpu.ops.pallas import fused_head as fh


@pytest.mark.parametrize("arch", ["efficientnet_b2", "mobilenetv2_100"])
def test_kernel_matches_plain_stage0(rng, arch):
    """Interpret-mode Pallas kernel == plain stem+stage0 (shared params)."""
    img = jnp.asarray(rng.standard_normal((2, 32, 64, 3)), jnp.float32)
    plain = FeaturePyramid(arch=arch)
    v = plain.init(jax.random.key(0), img, train=False)
    want = plain.apply(v, img, train=False)[0]
    consts = fh.prepare_consts(v["params"], v["batch_stats"],
                               act=ARCHS[arch].act, width=img.shape[2] // 2)
    got = fh.fused_stage0_apply(img, consts, tile_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_uneven_tiles_and_batch1(rng):
    """Row tiling must handle nt > 2 and batch 1."""
    img = jnp.asarray(rng.standard_normal((1, 48, 96, 3)), jnp.float32)
    plain = FeaturePyramid(arch="efficientnet_b2")
    v = plain.init(jax.random.key(0), img, train=False)
    want = plain.apply(v, img, train=False)[0]
    consts = fh.prepare_consts(v["params"], v["batch_stats"], act="silu",
                               width=img.shape[2] // 2)
    got = fh.fused_stage0_apply(img, consts, tile_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("arch", ["efficientnet_b2", "mobilenetv2_100"])
def test_fused_pyramid_param_tree_and_outputs(rng, arch):
    """FusedHeadPyramid: identical param tree; CPU path bit-exact."""
    img = jnp.asarray(rng.standard_normal((2, 32, 64, 3)), jnp.float32)
    plain = FeaturePyramid(arch=arch)
    fused = FusedHeadPyramid(arch=arch)
    v = plain.init(jax.random.key(0), img, train=False)
    v2 = fused.init(jax.random.key(1), img, train=False)
    paths = lambda vv: {
        (k, jax.tree_util.keystr(p), tuple(l.shape))
        for k in vv
        for p, l in jax.tree_util.tree_flatten_with_path(vv[k])[0]}
    assert paths(v2) == paths(v)
    want = plain.apply(v, img, train=False)
    got = fused.apply(v, img, train=False)
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_full_model_with_fused_head(rng):
    """ESMStereo with fuse_backbone_head uses the same params and (on the
    CPU fallback path) matches the plain model exactly."""
    base = dict(cv_scale=4, backbone="mobilenetv2_100", use_pallas=False)
    m_ref = ESMStereo(config=ESMStereoConfig(fuse_backbone_head=False,
                                             **base))
    m_f = ESMStereo(config=ESMStereoConfig(fuse_backbone_head=True, **base))
    left = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    variables = m_ref.init(jax.random.key(0), left, right, train=False)
    want = m_ref.apply(variables, left, right, train=False)[0]
    got = m_f.apply(variables, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
