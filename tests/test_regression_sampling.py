"""Golden tests for regression + resampling ops against torch semantics."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from esmstereo_tpu import ops


def test_disparity_regression_matches_reference(rng):
    b, d, h, w = 2, 12, 5, 7
    cost = rng.standard_normal((b, d, h, w)).astype(np.float32)
    vals = torch.arange(d, dtype=torch.float32).view(1, d, 1, 1)
    want = (torch.from_numpy(cost) * vals).sum(1)
    got = ops.disparity_regression(jnp.asarray(cost), d)
    np.testing.assert_allclose(np.asarray(got[..., 0]), want.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_regression_topk_matches_reference(rng):
    b, d, h, w = 2, 12, 5, 7
    k = 2
    cost = rng.standard_normal((b, d, h, w)).astype(np.float32)
    cost_t = torch.from_numpy(cost)
    samples_t = torch.arange(d, dtype=torch.float32).view(1, d, 1, 1).repeat(
        b, 1, h, w)
    _, ind = cost_t.sort(1, True)
    pool_ind = ind[:, :k]
    gathered = torch.gather(cost_t, 1, pool_ind)
    prob = F.softmax(gathered, 1)
    want = torch.sum(torch.gather(samples_t, 1, pool_ind) * prob, dim=1)

    got = ops.regression_topk(jnp.asarray(cost), None, k)
    np.testing.assert_allclose(np.asarray(got[..., 0]), want.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_soft_argmin_bounds(rng):
    b, d, h, w = 1, 8, 4, 4
    cost = rng.standard_normal((b, d, h, w)).astype(np.float32)
    disp = np.asarray(ops.soft_argmin(jnp.asarray(cost), d))
    assert disp.min() >= 0 and disp.max() <= d - 1


def test_resize_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         scale_factor=2, mode="bilinear",
                         align_corners=False)
    got = ops.upsample2x_bilinear(jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=1e-4, atol=1e-5)


def test_resize_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(11, 13), mode="nearest")
    got = ops.resize_nearest(jnp.asarray(x), (11, 13))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=0, atol=0)


def test_pixel_shuffle_matches_torch(rng):
    r, c = 2, 3
    x = rng.standard_normal((2, 4, 5, c * r * r)).astype(np.float32)
    want = F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), r)
    got = ops.pixel_shuffle(jnp.asarray(x), r)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=0, atol=0)


def test_unfold3x3_matches_torch(rng):
    x = rng.standard_normal((2, 5, 6, 1)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.unfold(xt, 3, 1, 1).reshape(2, 9, 5, 6)
    got = ops.unfold3x3(jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=0, atol=0)


def test_context_upsample_matches_torch(rng):
    b, h, w, scale = 1, 4, 5, 4
    depth = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    weights = rng.random((b, h * scale, w * scale, 9)).astype(np.float32)

    dt = torch.from_numpy(depth).permute(0, 3, 1, 2)
    wt = torch.from_numpy(weights).permute(0, 3, 1, 2)
    unf = F.unfold(dt, 3, 1, 1).reshape(b, -1, h, w)
    unf = F.interpolate(unf, (h * scale, w * scale), mode="nearest")
    want = (unf.reshape(b, 9, h * scale, w * scale) * wt).sum(1)

    got = ops.context_upsample(jnp.asarray(depth), jnp.asarray(weights), scale)
    np.testing.assert_allclose(np.asarray(got[..., 0]), want.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    for align in (True, False):
        x = rng.standard_normal((2, 6, 7, 3)).astype(np.float32)
        grid = (rng.random((2, 4, 5, 2)).astype(np.float32) * 2.4) - 1.2
        want = F.grid_sample(torch.from_numpy(x).permute(0, 3, 1, 2),
                             torch.from_numpy(grid), mode="bilinear",
                             padding_mode="zeros", align_corners=align)
        got = ops.grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid), align)
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"align_corners={align}")


def test_warp_matches_torch(rng):
    x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    disp = (rng.random((2, 6, 8, 1)).astype(np.float32) * 3.0)

    # torch reference semantics (submodule.py:227-243)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    dt = torch.from_numpy(disp).permute(0, 3, 1, 2)
    B_, C_, H_, W_ = xt.shape
    xx = torch.arange(W_).view(1, -1).repeat(H_, 1)
    yy = torch.arange(H_).view(-1, 1).repeat(1, W_)
    xx = xx.view(1, 1, H_, W_).repeat(B_, 1, 1, 1).float()
    yy = yy.view(1, 1, H_, W_).repeat(B_, 1, 1, 1).float()
    vgrid = torch.cat((xx, yy), 1)
    vgrid[:, :1] = vgrid[:, :1] - dt
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W_ - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H_ - 1, 1) - 1.0
    want = F.grid_sample(xt, vgrid.permute(0, 2, 3, 1), align_corners=False)

    got = ops.warp(jnp.asarray(x), jnp.asarray(disp))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=1e-4, atol=1e-5)
