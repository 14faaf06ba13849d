"""End-to-end shape and sanity tests for the ESMStereo model variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.models import ESMStereo, ESMStereoConfig

H, W = 64, 96


def _run(cfg, train):
    model = ESMStereo(config=cfg)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((1, H, W, 3)), dtype=jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, H, W, 3)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), left, right, train=False)
    if train:
        outs, _ = model.apply(variables, left, right, train=True,
                              mutable=["batch_stats"])
    else:
        outs = model.apply(variables, left, right, train=False)
    return outs


@pytest.mark.parametrize("cv_scale,backbone,out_scales", [
    (4, "mobilenetv2_100", (1, 2)),
    (8, "efficientnet_b2", (1, 2, 4)),
    (16, "mobilenetv2_100", (1, 4)),  # x4-stage upsampler: aux out at 1/4
])
def test_forward_shapes(cv_scale, backbone, out_scales):
    cfg = ESMStereoConfig(cv_scale=cv_scale, backbone=backbone,
                          cost_volume="gwc", use_pallas=False)
    outs = _run(cfg, train=True)
    assert len(outs) == len(out_scales)
    assert outs[0].shape == (1, H, W)
    for i, (o, s) in enumerate(zip(outs, out_scales)):
        assert bool(jnp.isfinite(o).all()), f"output {i} not finite"
        assert o.shape == (1, H // s, W // s), (i, o.shape)

    outs_eval = _run(cfg, train=False)
    assert len(outs_eval) == 1
    assert outs_eval[0].shape == (1, H, W)


def test_norm_correlation_variant():
    cfg = ESMStereoConfig(cv_scale=4, backbone="mobilenetv2_100",
                          cost_volume="norm_correlation", use_pallas=False)
    outs = _run(cfg, train=False)
    assert outs[0].shape == (1, H, W)
    assert bool(jnp.isfinite(outs[0]).all())


def test_invalid_configs_rejected():
    with pytest.raises(ValueError):
        ESMStereoConfig(cv_scale=8, backbone="mobilenetv2_100")
    with pytest.raises(ValueError):
        ESMStereoConfig(cv_scale=16, backbone="efficientnet_b2")


def test_param_count_reasonable():
    # L variant with efficientnet_b2 should be a few-million-param model
    cfg = ESMStereoConfig(cv_scale=4, backbone="efficientnet_b2",
                          use_pallas=False)
    model = ESMStereo(config=cfg)
    x = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.key(0), x, x, train=False)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 2e6 < n < 20e6, n


def test_shufflemixer_sr_network():
    """The standalone ShuffleMixer SR net (unused by ESMStereo but part of
    the reference surface, shufflemixer.py:135-176)."""
    from esmstereo_tpu.nn import ShuffleMixerSR

    m = ShuffleMixerSR(n_feats=16, kernel_size=7, n_blocks=1, mlp_ratio=2,
                       upscaling_factor=4)
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 24, 3)),
                    dtype=jnp.float32)
    variables = m.init(jax.random.key(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 64, 96, 3)
    assert bool(jnp.isfinite(y).all())
