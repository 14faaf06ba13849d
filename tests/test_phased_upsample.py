"""Phase-folded Upsample4 vs the reference-layout module (shared params)."""

import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu.models.esmstereo import ESMStereo, ESMStereoConfig, Upsample4
from esmstereo_tpu.models.phased_upsample import PhUpsample4

H4, W4 = 16, 24  # base (1/4) grid


def _inputs(rng):
    f1x = jnp.asarray(rng.standard_normal((1, H4 // 2, W4 // 2, 96)),
                      jnp.float32)          # x8' features @1/8
    f2x = jnp.asarray(rng.standard_normal((1, H4, W4, 48)), jnp.float32)
    f4x = jnp.asarray(rng.standard_normal((1, H4 * 2, W4 * 2, 32)),
                      jnp.float32)          # stem_2x @1/2
    init = jnp.asarray(rng.random((1, H4, W4, 1)) * 20, jnp.float32)
    return f1x, f2x, f4x, init


def test_phased_upsample_matches_reference_module(rng):
    f1x, f2x, f4x, init = _inputs(rng)
    ref = Upsample4()
    ph = PhUpsample4()
    variables = ref.init(jax.random.key(0), f1x, f2x, f4x, init, train=False)
    want4, want2 = ref.apply(variables, f1x, f2x, f4x, init, train=False)
    got4, got2 = ph.apply(variables, f1x, f2x, f4x, init, train=False)
    assert got4.shape == want4.shape and got2.shape == want2.shape
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want4),
                               rtol=1e-3, atol=1e-3)


def test_full_model_with_phase_fold(rng):
    base = dict(cv_scale=4, backbone="mobilenetv2_100", use_pallas=False)
    m_ref = ESMStereo(config=ESMStereoConfig(**base))
    m_ph = ESMStereo(config=ESMStereoConfig(phase_fold_upsample=True, **base))
    left = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    variables = m_ref.init(jax.random.key(0), left, right, train=False)
    want = m_ref.apply(variables, left, right, train=False)[0]
    got = m_ph.apply(variables, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=5e-3)


def test_phased_upsample8_matches_reference_module(rng):
    from esmstereo_tpu.models.esmstereo import Upsample8
    from esmstereo_tpu.models.phased_upsample import PhUpsample8

    H8, W8 = 8, 12  # base (1/8) grid
    f2x = jnp.asarray(rng.standard_normal((1, H8 // 2, W8 // 2, 240)),
                      jnp.float32)  # x16' @1/16
    f4x = jnp.asarray(rng.standard_normal((1, H8, W8, 96)), jnp.float32)
    f8x = jnp.asarray(rng.standard_normal((1, H8 * 2, W8 * 2, 24)),
                      jnp.float32)  # x4 raw @1/4
    stem2 = jnp.asarray(rng.standard_normal((1, H8 * 4, W8 * 4, 32)),
                        jnp.float32)
    init = jnp.asarray(rng.random((1, H8, W8, 1)) * 10, jnp.float32)

    ref = Upsample8()
    ph = PhUpsample8()
    variables = ref.init(jax.random.key(0), f2x, f4x, f8x, stem2, init,
                         train=False)
    wants = ref.apply(variables, f2x, f4x, f8x, stem2, init, train=False)
    gots = ph.apply(variables, f2x, f4x, f8x, stem2, init, train=False)
    for i, (g, w) in enumerate(zip(gots, wants)):
        assert g.shape == w.shape, (i, g.shape, w.shape)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-3, err_msg=str(i))


def test_phased_upsample16_matches_reference_module(rng):
    from esmstereo_tpu.models.esmstereo import Upsample16
    from esmstereo_tpu.models.phased_upsample import PhUpsample16

    H16, W16 = 4, 6  # base (1/16) grid
    f1x = jnp.asarray(rng.standard_normal((1, H16 * 2, W16 * 2, 32)),
                      jnp.float32)   # x8 feats @1/8
    f2x = jnp.asarray(rng.standard_normal((1, H16, W16, 32)), jnp.float32)
    f4x = jnp.asarray(rng.standard_normal((1, H16 * 4, W16 * 4, 24)),
                      jnp.float32)   # x4 feats @1/4
    f8x = jnp.asarray(rng.standard_normal((1, H16 * 8, W16 * 8, 24)),
                      jnp.float32)   # f0 conv @1/2
    init = jnp.asarray(rng.random((1, H16, W16, 1)) * 6, jnp.float32)

    ref = Upsample16()
    ph = PhUpsample16()
    variables = ref.init(jax.random.key(0), f1x, f2x, f4x, f8x, init,
                         train=False)
    wants = ref.apply(variables, f1x, f2x, f4x, f8x, init, train=False)
    gots = ph.apply(variables, f1x, f2x, f4x, f8x, init, train=False)
    for i, (g, w) in enumerate(zip(gots, wants)):
        assert g.shape == w.shape, (i, g.shape, w.shape)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-3, err_msg=str(i))
