"""Confidence-variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from esmstereo_tpu.models import ESMStereoConfig
from esmstereo_tpu.models.confidence import ESMStereoConfidence


def test_confidence_forward():
    cfg = ESMStereoConfig(cv_scale=16, backbone="mobilenetv2_100",
                          cost_volume="gwc", use_pallas=False)
    model = ESMStereoConfidence(config=cfg)
    rng = np.random.default_rng(0)
    h, w = 64, 96
    left = jnp.asarray(rng.standard_normal((1, h, w, 3)), dtype=jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, h, w, 3)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), left, right, train=False)
    disp, conf = model.apply(variables, left, right, train=False)
    assert disp.shape == (1, h, w)
    assert conf.shape == (1, h, w)
    assert bool(jnp.isfinite(disp).all())
    assert float(conf.min()) >= 0.0 and float(conf.max()) <= 1.0


def test_grid_enlarge_matches_reference_semantics(rng):
    """The 3x3 enlarged grid + grid_sample path vs torch-expressed math
    (ESMStereo_confidence.py:693-717)."""
    b, c, h, w = 1, 4, 5, 6
    feat = rng.standard_normal((b, c, h, w)).astype(np.float32)
    scale = rng.random((b, 1, h, w)).astype(np.float32)

    # torch reference construction
    grid_w, grid_h = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
    gh = torch.tensor(grid_h, dtype=torch.float).repeat(b, 1, 1, 1)
    gw = torch.tensor(grid_w, dtype=torch.float).repeat(b, 1, 1, 1)
    grid = torch.cat((gw, gh), 1).transpose(1, 2).transpose(2, 3)
    st = torch.from_numpy(scale).transpose(1, 2).transpose(2, 3)
    ge = torch.zeros([b, 3 * h, 3 * w, 2])
    step_y = 2 / (w - 1)
    for di, dy in enumerate((-1, 0, 1)):
        for dj, dx in enumerate((-1, 0, 1)):
            ge[:, di::3, dj::3, :] = grid + torch.cat(
                (dx * step_y * st, dy * st), 3)
    want = F.grid_sample(torch.from_numpy(feat), ge, align_corners=True)

    # our construction
    from esmstereo_tpu import ops
    from esmstereo_tpu.models.confidence import build_enlarged_grid
    grid_j = build_enlarged_grid(jnp.asarray(scale[:, 0]))
    got = ops.grid_sample_bilinear(
        jnp.asarray(np.transpose(feat, (0, 2, 3, 1))), grid_j,
        align_corners=True)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=1e-4, atol=1e-5)


def test_phased_conf_upsample_matches_plain(rng):
    """PhConfUpsample vs ConfUpsample with shared parameters (exact
    reparameterization; see PhConfUpsample docstring)."""
    from esmstereo_tpu.models.confidence import ConfUpsample, PhConfUpsample
    from esmstereo_tpu.nn.phasefold import from_phases

    h, w = 8, 12
    feat = jnp.asarray(rng.standard_normal((1, h, w, 24)), jnp.float32)
    init = jnp.asarray(rng.random((1, h, w, 1)), jnp.float32)
    ref = ConfUpsample(16)
    ph = PhConfUpsample(16)
    variables = ref.init(jax.random.key(0), feat, init, train=False)
    want = ref.apply(variables, feat, init, train=False)
    got_ph = ph.apply(variables, feat, init, train=False)
    got = from_phases(got_ph, 4)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_full_confidence_model_with_phase_fold(rng):
    """End-to-end confidence model: phased vs plain upsampling head with
    shared parameters."""
    base = dict(cv_scale=16, backbone="mobilenetv2_100",
                cost_volume="norm_correlation", use_pallas=False)
    m_ref = ESMStereoConfidence(
        config=ESMStereoConfig(phase_fold_upsample=False, **base))
    m_ph = ESMStereoConfidence(
        config=ESMStereoConfig(phase_fold_upsample=True, **base))
    rng_np = np.random.default_rng(7)
    left = jnp.asarray(rng_np.standard_normal((1, 64, 96, 3)), jnp.float32)
    right = jnp.asarray(rng_np.standard_normal((1, 64, 96, 3)), jnp.float32)
    variables = m_ref.init(jax.random.key(0), left, right, train=False)
    want_d, want_c = m_ref.apply(variables, left, right, train=False)
    got_d, got_c = m_ph.apply(variables, left, right, train=False)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=2e-3, atol=2e-3)
