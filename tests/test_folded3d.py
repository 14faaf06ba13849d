"""Equivalence tests: depth-folded 3-D ops vs the NDHWC formulation.

Same parameters (path-compatible trees) must give identical results up to
float reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.nn.blocks import ConvBlock
from esmstereo_tpu.nn.folded3d import (
    FoldedConvBlock3D,
    fold_volume,
    unfold_volume,
)

B, D, H, W, C = 2, 8, 6, 10, 4


@pytest.fixture
def vol(rng):
    return jnp.asarray(rng.standard_normal((B, D, H, W, C)), jnp.float32)


def _compare(vol, *, features, kernel, stride, padding, deconv, train):
    ref = ConvBlock(features, kernel, stride, padding, deconv=deconv,
                    dims=3, bn=True, act="gelu")
    fold = FoldedConvBlock3D(features, C, D, kernel, stride, padding,
                             deconv=deconv, bn=True, act="gelu")
    variables = ref.init(jax.random.key(0), vol, train=False)
    folded_in = fold_volume(vol)

    if train:
        want, wstats = ref.apply(variables, vol, train=True,
                                 mutable=["batch_stats"])
        got, gstats = fold.apply(variables, folded_in, train=True,
                                 mutable=["batch_stats"])
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(gstats["batch_stats"]["bn"][k]),
                np.asarray(wstats["batch_stats"]["bn"][k]),
                rtol=1e-4, atol=1e-5, err_msg=k)
    else:
        want = ref.apply(variables, vol, train=False)
        got = fold.apply(variables, folded_in, train=False)

    got_vol = unfold_volume(got, features)
    np.testing.assert_allclose(np.asarray(got_vol), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("train", [False, True])
def test_conv_stride1(vol, train):
    _compare(vol, features=6, kernel=3, stride=1, padding=1, deconv=False,
             train=train)


def test_conv_stride2(vol):
    _compare(vol, features=6, kernel=3, stride=2, padding=1, deconv=False,
             train=False)


def test_conv_1x1(vol):
    _compare(vol, features=6, kernel=1, stride=1, padding=0, deconv=False,
             train=False)


def test_deconv_k4s2(vol):
    _compare(vol, features=6, kernel=4, stride=2, padding=1, deconv=True,
             train=False)


def test_odd_depth_roundtrip(rng):
    """cv16-style odd depths: conv s2 then deconv crops correctly."""
    v = jnp.asarray(rng.standard_normal((1, 3, 6, 6, 4)), jnp.float32)
    ref = ConvBlock(4, 3, 2, 1, dims=3)
    fold = FoldedConvBlock3D(4, 4, 3, 3, 2, 1)
    variables = ref.init(jax.random.key(1), v, train=False)
    want = ref.apply(variables, v, train=False)
    got = unfold_volume(fold.apply(variables, fold_volume(v), train=False), 4)
    assert got.shape == want.shape == (1, 2, 3, 3, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("deconv,kernel,stride,padding", [
    (False, 3, 1, 1), (False, 3, 2, 1), (True, 4, 2, 1),
])
def test_depth_blocked_matches_dense(rng, deconv, kernel, stride, padding):
    """depth_block tiling is exact vs the single dense band."""
    d, c = 24, 4
    v = jnp.asarray(rng.standard_normal((1, 6, 8, d * c)), jnp.float32)
    dense = FoldedConvBlock3D(5, c, d, kernel, stride, padding,
                              deconv=deconv, depth_block=None)
    blocked = FoldedConvBlock3D(5, c, d, kernel, stride, padding,
                                deconv=deconv, depth_block=7)
    variables = dense.init(jax.random.key(2), v, train=False)
    want = dense.apply(variables, v, train=False)
    got = blocked.apply(variables, v, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
