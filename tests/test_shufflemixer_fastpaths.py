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
