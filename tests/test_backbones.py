"""Shape/structure tests for the feature-pyramid backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.backbones import ARCHS, FeaturePyramid


@pytest.mark.parametrize("arch", ["mobilenetv2_100", "efficientnet_b2"])
def test_pyramid_shapes(arch):
    m = FeaturePyramid(arch=arch)
    x = jnp.zeros((1, 64, 96, 3))
    variables = m.init(jax.random.key(0), x)
    feats = m.apply(variables, x)
    chans = ARCHS[arch].chans
    assert len(feats) == 5
    for i, (f, c) in enumerate(zip(feats, chans)):
        s = 2 ** (i + 1)
        assert f.shape == (1, 64 // s, 96 // s, c), (i, f.shape)


def test_train_mode_updates_batch_stats():
    m = FeaturePyramid(arch="mobilenetv2_100")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    dtype=jnp.float32)
    variables = m.init(jax.random.key(0), x)
    _, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    # running means must have moved off zero somewhere
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_outputs_finite():
    m = FeaturePyramid(arch="efficientnet_b2")
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3)),
                    dtype=jnp.float32)
    variables = m.init(jax.random.key(0), x)
    feats = m.apply(variables, x)
    for f in feats:
        assert bool(jnp.isfinite(f).all())
