"""Golden tests for cost-volume builders against torch-expressed reference math.

The torch helpers below re-state the reference semantics
(`/root/reference/models/submodule.py:105-200`) — loop over disparity
shifts, write the valid slice, leave zeros elsewhere — in NCHW, then we
compare against the NHWC/NDHWC jnp implementations.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esmstereo_tpu import ops


def _np_to_nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _vol_to_torch_layout(vol_bdhwg):
    # (B, D, H, W, G) -> (B, G, D, H, W)
    return np.transpose(np.asarray(vol_bdhwg), (0, 4, 1, 2, 3))


def _torch_group_corr(f1, f2, g):
    b, c, h, w = f1.shape
    return (f1 * f2).reshape(b, g, c // g, h, w).mean(dim=2)


def _torch_gwc_volume(ref, tgt, maxdisp, g):
    b, c, h, w = ref.shape
    vol = torch.zeros(b, g, maxdisp, h, w)
    for i in range(maxdisp):
        if i > 0:
            vol[:, :, i, :, i:] = _torch_group_corr(
                ref[:, :, :, i:], tgt[:, :, :, :-i], g)
        else:
            vol[:, :, i] = _torch_group_corr(ref, tgt, g)
    return vol


def _torch_norm_corr(f1, f2):
    n1 = torch.norm(f1, 2, 1, True) + 1e-5
    n2 = torch.norm(f2, 2, 1, True) + 1e-5
    return ((f1 / n1) * (f2 / n2)).mean(dim=1, keepdim=True)


def _torch_norm_corr_volume(ref, tgt, maxdisp):
    b, c, h, w = ref.shape
    vol = torch.zeros(b, 1, maxdisp, h, w)
    for i in range(maxdisp):
        if i > 0:
            vol[:, :, i, :, i:] = _torch_norm_corr(
                ref[:, :, :, i:], tgt[:, :, :, :-i])
        else:
            vol[:, :, i] = _torch_norm_corr(ref, tgt)
    return vol


def _torch_gwc_norm_volume(ref, tgt, maxdisp, g):
    b, c, h, w = ref.shape

    def corr(f1, f2):
        f1 = f1.reshape(f1.shape[0], g, c // g, *f1.shape[2:])
        f2 = f2.reshape(f2.shape[0], g, c // g, *f2.shape[2:])
        n1 = torch.norm(f1, 2, 2, True) + 1e-5
        n2 = torch.norm(f2, 2, 2, True) + 1e-5
        return ((f1 / n1) * (f2 / n2)).mean(dim=2)

    vol = torch.zeros(b, g, maxdisp, h, w)
    for i in range(maxdisp):
        if i > 0:
            vol[:, :, i, :, i:] = corr(ref[:, :, :, i:], tgt[:, :, :, :-i])
        else:
            vol[:, :, i] = corr(ref, tgt)
    return vol


def _torch_subtract_volume(ref, tgt, maxdisp, g):
    b, c, h, w = ref.shape

    def diff(f1, f2):
        f1 = f1.reshape(f1.shape[0], g, c // g, *f1.shape[2:])
        f2 = f2.reshape(f2.shape[0], g, c // g, *f2.shape[2:])
        return ((f1 - f2) ** 2).sum(dim=2)

    vol = torch.zeros(b, g, maxdisp, h, w)
    for i in range(maxdisp):
        if i > 0:
            vol[:, :, i, :, i:] = diff(ref[:, :, :, i:], tgt[:, :, :, :-i])
        else:
            vol[:, :, i] = diff(ref, tgt)
    return vol


B, C, H, W, D, G = 2, 16, 6, 20, 7, 4


@pytest.fixture
def feats(rng):
    ref = rng.standard_normal((B, C, H, W)).astype(np.float32)
    tgt = rng.standard_normal((B, C, H, W)).astype(np.float32)
    return ref, tgt


def test_gwc_volume_matches_reference(feats):
    ref, tgt = feats
    want = _torch_gwc_volume(torch.from_numpy(ref), torch.from_numpy(tgt), D, G)
    got = ops.build_gwc_volume(_np_to_nhwc(ref), _np_to_nhwc(tgt), D, G)
    assert got.shape == (B, D, H, W, G)
    np.testing.assert_allclose(
        _vol_to_torch_layout(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_norm_correlation_volume_matches_reference(feats):
    ref, tgt = feats
    want = _torch_norm_corr_volume(
        torch.from_numpy(ref), torch.from_numpy(tgt), D)
    got = ops.build_norm_correlation_volume(
        _np_to_nhwc(ref), _np_to_nhwc(tgt), D)
    assert got.shape == (B, D, H, W, 1)
    np.testing.assert_allclose(
        _vol_to_torch_layout(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_gwc_volume_norm_matches_reference(feats):
    ref, tgt = feats
    want = _torch_gwc_norm_volume(
        torch.from_numpy(ref), torch.from_numpy(tgt), D, G)
    got = ops.build_gwc_volume_norm(_np_to_nhwc(ref), _np_to_nhwc(tgt), D, G)
    np.testing.assert_allclose(
        _vol_to_torch_layout(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_subtract_volume_matches_reference(feats):
    ref, tgt = feats
    want = _torch_subtract_volume(
        torch.from_numpy(ref), torch.from_numpy(tgt), D, G)
    got = ops.build_subtract_volume(_np_to_nhwc(ref), _np_to_nhwc(tgt), D, G)
    np.testing.assert_allclose(
        _vol_to_torch_layout(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_concat_volume_matches_reference(feats):
    ref_t, tgt_t = (torch.from_numpy(x) for x in feats)
    want = torch.zeros(B, 2 * C, D, H, W)
    for i in range(D):
        want[:, :C, i] = ref_t
        if i > 0:
            want[:, C:, i, :, i:] = tgt_t[:, :, :, :-i]
        else:
            want[:, C:, i] = tgt_t
    got = ops.build_concat_volume(_np_to_nhwc(feats[0]), _np_to_nhwc(feats[1]), D)
    assert got.shape == (B, D, H, W, 2 * C)
    np.testing.assert_allclose(
        _vol_to_torch_layout(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_gwc_volume_zero_disparity_is_identity_correlation(feats):
    ref, tgt = feats
    got = ops.build_gwc_volume(_np_to_nhwc(ref), _np_to_nhwc(ref), D, G)
    # d=0 plane of self-correlation = per-group mean of squares
    want = np.transpose(
        (ref.reshape(B, G, C // G, H, W) ** 2).mean(axis=2), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got[:, 0]), want, rtol=1e-5, atol=1e-5)


def test_invalid_region_is_zero(feats):
    ref, tgt = feats
    vol = np.asarray(ops.build_gwc_volume(_np_to_nhwc(ref), _np_to_nhwc(tgt), D, G))
    for d in range(1, D):
        assert np.all(vol[:, d, :, :d, :] == 0.0), f"disparity {d} leak"
