"""Phase-folding equivalence tests: base-grid folded convs must exactly
match the fine-resolution originals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu import ops
from esmstereo_tpu.nn.phasefold import (
    from_phases,
    phase_bilinear2x,
    phase_conv,
    to_phases,
)


def _conv(x, w, stride, pad):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (stride, stride),
                                        [(pad, pad)] * 2,
                                        dimension_numbers=dn)


def _deconv(x, w, stride, pad):
    k = w.shape[0]
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, jnp.flip(w, axis=(0, 1)), (1, 1), [(k - 1 - pad,) * 2] * 2,
        lhs_dilation=(stride, stride), dimension_numbers=dn)


def test_roundtrip_phases(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)), jnp.float32)
    for p in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(from_phases(to_phases(x, p), p)), np.asarray(x))


@pytest.mark.parametrize("k,stride,pad,p_in,p_out", [
    (3, 1, 1, 2, 2),    # stride-1 conv at 1/2-real res
    (5, 1, 2, 2, 2),    # k5 'same' (dm stack emulated with ring masks)
    (1, 1, 0, 2, 2),    # 1x1 conv
    (3, 1, 1, 4, 4),    # full-res conv in 4-phase space
    (3, 2, 1, 2, 1),    # stride-2 conv leaving phase space
    (3, 2, 1, 4, 2),    # stride-2 conv within phase space
    (7, 1, 3, 2, 2),    # shufflemixer depthwise-sized kernel (dense here)
])
def test_phase_conv_matches_fine(rng, k, stride, pad, p_in, p_out):
    ci, co = 3, 5
    h, w = 8, 12  # base grid
    x_fine = jnp.asarray(
        rng.standard_normal((1, h * p_in, w * p_in, ci)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.2, jnp.float32)

    want = _conv(x_fine, wgt, stride, pad)
    got_ph = phase_conv(to_phases(x_fine, p_in) if p_in > 1 else x_fine,
                        wgt, "conv", pad, p_in, p_out)
    got = from_phases(got_ph, p_out) if p_out > 1 else got_ph
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("p_in", [1, 2])
def test_phase_deconv_matches_fine(rng, p_in):
    k, pad = 4, 1
    ci, co = 3, 4
    h, w = 8, 12
    x_fine = jnp.asarray(
        rng.standard_normal((1, h * p_in, w * p_in, ci)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.2, jnp.float32)

    want = _deconv(x_fine, wgt, 2, pad)
    got_ph = phase_conv(to_phases(x_fine, p_in) if p_in > 1 else x_fine,
                        wgt, "deconv", pad, p_in, 2 * p_in)
    got = from_phases(got_ph, 2 * p_in)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_phase_bilinear2x_matches_resize(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 9, 4)), jnp.float32)
    want = ops.upsample2x_bilinear(x)
    got = from_phases(phase_bilinear2x(x), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
