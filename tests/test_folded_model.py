"""Folded vs unfolded full-model equivalence (same parameter tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.models import ESMStereo, ESMStereoConfig

H, W = 64, 96


@pytest.mark.parametrize("cv_scale,backbone,cost_volume", [
    (4, "mobilenetv2_100", "gwc"),
    (4, "mobilenetv2_100", "norm_correlation"),
    (16, "mobilenetv2_100", "gwc"),
])
def test_folded_matches_unfolded(cv_scale, backbone, cost_volume, rng):
    base = dict(cv_scale=cv_scale, backbone=backbone,
                cost_volume=cost_volume, use_pallas=False)
    m_ref = ESMStereo(config=ESMStereoConfig(fold_depth=False, **base))
    m_fold = ESMStereo(config=ESMStereoConfig(fold_depth=True, **base))

    left = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    variables = m_ref.init(jax.random.key(0), left, right, train=False)

    want = m_ref.apply(variables, left, right, train=False)[0]
    got = m_fold.apply(variables, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=5e-3)


def test_folded_train_step_runs(rng):
    from esmstereo_tpu.data.synthetic import make_batch
    from esmstereo_tpu.train.state import create_train_state, make_optimizer
    from esmstereo_tpu.train.step import make_train_step

    model = ESMStereo(config=ESMStereoConfig(
        cv_scale=4, backbone="mobilenetv2_100", fold_depth=True))
    b = make_batch(np.random.default_rng(0), batch=1, h=64, w=64)
    batch = {k: (jnp.asarray(v) if not isinstance(v, list)
                 else [jnp.asarray(x) for x in v]) for k, v in b.items()}
    state = create_train_state(model, jax.random.key(0), batch,
                               make_optimizer("adamw", 1e-3))
    step = jax.jit(make_train_step(model), donate_argnums=(0,))
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_siamese_batch_matches_separate_eval(rng):
    """Eval-mode numerics are identical with batched siamese towers."""
    base = dict(cv_scale=4, backbone="mobilenetv2_100", use_pallas=False)
    m_sep = ESMStereo(config=ESMStereoConfig(siamese_batch=False, **base))
    m_bat = ESMStereo(config=ESMStereoConfig(siamese_batch=True, **base))
    left = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    variables = m_sep.init(jax.random.key(0), left, right, train=False)
    want = m_sep.apply(variables, left, right, train=False)[0]
    got = m_bat.apply(variables, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
