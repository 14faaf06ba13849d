"""Pallas correlation kernel vs the jnp golden implementations.

Runs in interpreter mode on CPU (the real kernel path is exercised on TPU
by bench.py and the TPU smoke script).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from esmstereo_tpu import ops
from esmstereo_tpu.ops.pallas import correlation as pk

B, H, W, C, D = 2, 8, 32, 16, 6


@pytest.fixture
def feats(rng):
    ref = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype=jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype=jnp.float32)
    return ref, tgt


def test_gwc_matches_jnp(feats):
    ref, tgt = feats
    with pltpu.force_tpu_interpret_mode():
        got = pk.correlation_volume(ref, tgt, D, 4)
    want = ops.build_gwc_volume(ref, tgt, D, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_norm_correlation_matches_jnp(feats):
    ref, tgt = feats
    with pltpu.force_tpu_interpret_mode():
        got = pk.correlation_volume(ref, tgt, D, 1, normalize=True)
    want = ops.build_norm_correlation_volume(ref, tgt, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gwc_norm_matches_jnp(feats):
    ref, tgt = feats
    with pltpu.force_tpu_interpret_mode():
        got = pk.correlation_volume(ref, tgt, D, 4, normalize=True)
    want = ops.build_gwc_volume_norm(ref, tgt, D, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_output_dtype(feats):
    ref, tgt = feats
    with pltpu.force_tpu_interpret_mode():
        got = pk.correlation_volume(ref.astype(jnp.bfloat16),
                                    tgt.astype(jnp.bfloat16), D, 4)
    assert got.dtype == jnp.bfloat16
    want = ops.build_gwc_volume(ref, tgt, D, 4)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


def test_folded_gwc_matches_jnp(feats):
    ref, tgt = feats
    with pltpu.force_tpu_interpret_mode():
        got = pk.correlation_volume_folded(ref, tgt, D, 4)
    want = ops.build_gwc_volume_folded(ref, tgt, D, 4)
    assert got.shape == want.shape == (B, H, W, D * 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_norm_correlation_matches_jnp(feats):
    ref, tgt = feats
    with pltpu.force_tpu_interpret_mode():
        got = pk.correlation_volume_folded(ref, tgt, D, 1, normalize=True)
    want = ops.build_norm_correlation_volume_folded(ref, tgt, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_unaligned_width_matches_jnp(rng):
    """Widths that are not sublane (8) multiples — e.g. 544x960 cv16 gives
    a 60-wide grid — are zero-padded inside the kernel and sliced back."""
    for w in (60, 30):
        ref = jnp.asarray(rng.standard_normal((1, 8, w, 16)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((1, 8, w, 16)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = pk.correlation_volume_folded(ref, tgt, 12, 4)
        want = ops.build_gwc_volume_folded(ref, tgt, 12, 4)
        assert got.shape == want.shape == (1, 8, w, 48)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
