"""Equivalence of the TPU fast paths in the ShuffleMixer blocks:
permutation-matmul channel shuffle and deconv-reparameterised pixel
shuffle must match the naive formulations exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from einops import rearrange

from esmstereo_tpu import ops
from esmstereo_tpu.nn.shufflemixer import PixelShuffleUp, channel_shuffle


def test_channel_shuffle_matches_einops(rng):
    x = rng.standard_normal((2, 4, 5, 16)).astype(np.float32)
    want = rearrange(torch.from_numpy(x).permute(0, 3, 1, 2),
                     "b (g d) h w -> b (d g) h w", g=8)
    got = channel_shuffle(jnp.asarray(x), 8)
    np.testing.assert_array_equal(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy())


def test_pixel_shuffle_up_matches_naive(rng):
    for r in (2, 4):
        co, ci = 3, 8
        m = PixelShuffleUp(co, r)
        x = jnp.asarray(rng.standard_normal((1, 6, 10, ci)), jnp.float32)
        variables = m.init(jax.random.key(0), x)
        got = m.apply(variables, x)

        # naive: 1x1 conv -> torch pixel shuffle -> silu, same params
        k = np.asarray(variables["params"]["conv"]["Conv_0"]["kernel"])
        b = np.asarray(variables["params"]["conv"]["Conv_0"]["bias"])
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        wt = torch.from_numpy(np.transpose(k[0, 0], (1, 0)))[:, :, None, None]
        y = F.conv2d(xt, wt, torch.from_numpy(b))
        y = F.silu(F.pixel_shuffle(y, r))
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), y.numpy(),
            rtol=1e-5, atol=1e-5, err_msg=f"r={r}")


def _rand_conv(rng, kh, kw, ci, co, bias=True):
    d = {"kernel": jnp.asarray(rng.standard_normal((kh, kw, ci, co)) * 0.2,
                               jnp.float32)}
    if bias:
        d["bias"] = jnp.asarray(rng.standard_normal((co,)) * 0.1,
                                jnp.float32)
    return {"Conv_0": d}


def _rand_sm(rng):
    return {
        "norm1": {"weight": jnp.asarray(rng.random(16) + 0.5, jnp.float32)},
        "mlp1": {"fc1": _rand_conv(rng, 1, 1, 8, 16),
                 "fc2": _rand_conv(rng, 1, 1, 16, 8)},
        "spatial": _rand_conv(rng, 7, 7, 1, 16),
        "norm2": {"weight": jnp.asarray(rng.random(16) + 0.5, jnp.float32)},
        "mlp2": {"fc1": _rand_conv(rng, 1, 1, 8, 16),
                 "fc2": _rand_conv(rng, 1, 1, 16, 8)},
    }


def test_wphase_mixer_matches_reference(rng):
    """attic.wphase.mixer_wphase vs the plain mixer lowering (same params):
    exact up to float reassociation of the folded block matmuls."""
    from esmstereo_tpu.attic.wphase import mixer_wphase
    from esmstereo_tpu.nn.mixer import mixer_reference

    def fm():
        return {"sm1": _rand_sm(rng), "sm2": _rand_sm(rng),
                "conv_expand": _rand_conv(rng, 3, 3, 16, 32),
                "conv_project": _rand_conv(rng, 1, 1, 32, 16)}

    params = {"to_feat": _rand_conv(rng, 3, 3, 32, 16, bias=False),
              "block0": fm(), "block1": fm(),
              "up": {"conv": _rand_conv(rng, 1, 1, 16, 64)}}
    x = jnp.asarray(rng.standard_normal((1, 12, 24, 32)), jnp.float32)
    want = mixer_reference(x, params)
    got = mixer_wphase(x, params)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=5e-4)


def test_wphase_mixer_in_full_model(rng):
    """Full L model with wphase_mixer on vs off, shared parameters."""
    from esmstereo_tpu.models.esmstereo import ESMStereo, ESMStereoConfig

    base = dict(cv_scale=4, backbone="mobilenetv2_100", use_pallas=False)
    m_ref = ESMStereo(config=ESMStereoConfig(**base))
    m_wp = ESMStereo(config=ESMStereoConfig(wphase_mixer=True, **base))
    left = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    variables = m_ref.init(jax.random.key(0), left, right, train=False)
    want = m_ref.apply(variables, left, right, train=False)[0]
    got = m_wp.apply(variables, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=5e-3)
