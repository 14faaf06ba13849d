"""Train-step integration tests: loss decreases when overfitting synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu.data.synthetic import make_batch
from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
from esmstereo_tpu.train.schedule import lr_for_epoch, lr_schedule_fn
from esmstereo_tpu.train.state import (
    count_params,
    create_train_state,
    make_optimizer,
)
from esmstereo_tpu.train.step import make_eval_step, make_train_step


def _to_jax(batch):
    return {k: (jnp.asarray(v) if not isinstance(v, list)
                else [jnp.asarray(x) for x in v]) for k, v in batch.items()}


def test_overfit_synthetic_pair():
    cfg = ESMStereoConfig(cv_scale=4, backbone="mobilenetv2_100",
                          cost_volume="gwc", use_pallas=False)
    model = ESMStereo(config=cfg)
    rng = np.random.default_rng(0)
    batch = _to_jax(make_batch(rng, batch=1, h=64, w=64, disp_range=(4, 10)))

    state = create_train_state(model, jax.random.key(0), batch,
                               make_optimizer("adamw", 1e-3))
    step = jax.jit(make_train_step(model), donate_argnums=(0,))

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.8, losses


def test_eval_step_runs():
    cfg = ESMStereoConfig(cv_scale=4, backbone="mobilenetv2_100",
                          cost_volume="gwc", use_pallas=False)
    model = ESMStereo(config=cfg)
    rng = np.random.default_rng(1)
    batch = _to_jax(make_batch(rng, batch=1, h=64, w=64))
    state = create_train_state(model, jax.random.key(0), batch,
                               make_optimizer("adam", 1e-3))
    metrics, disp = jax.jit(make_eval_step(model))(state, batch)
    for k in ("EPE", "D1", "Thres1", "Thres2", "Thres3", "loss"):
        assert np.isfinite(float(metrics[k])), k
    assert disp.shape == batch["disparity"].shape
    assert count_params(state.params) > 1e6


def test_lrepochs_dsl():
    spec = "20,32,40,48,56:2"
    assert lr_for_epoch(1e-3, 0, spec) == 1e-3
    assert lr_for_epoch(1e-3, 20, spec) == 5e-4
    assert lr_for_epoch(1e-3, 33, spec) == 2.5e-4
    assert lr_for_epoch(1e-3, 59, spec) == 1e-3 / 32
    fn = lr_schedule_fn(1e-3, spec, steps_per_epoch=10)
    np.testing.assert_allclose(float(fn(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(fn(200)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(fn(590)), 1e-3 / 32, rtol=1e-6)
