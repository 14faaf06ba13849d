"""Integrated fused-kernel model paths, exercised on CPU via interpret mode.

The per-kernel tests cover each Pallas body against its module twin, but
the *integration* — FoldedConvParams/StemBlockParams lookups,
prepare_consts folding, and the model's dispatch wiring — previously only
executed on a real TPU (tools/tpu_numeric_check.py). The
``ops.pallas.set_force_interpret`` hook routes every fast-path gate to
interpret-mode kernels on the CPU backend so the full model graph with
ALL fused sections active is compared against the plain path with shared
parameters.
"""

import jax
import numpy as np
import pytest

from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
from esmstereo_tpu.ops import pallas as plmod

H, W = 64, 96


@pytest.fixture
def force_interpret():
    plmod.set_force_interpret(True)
    yield
    plmod.set_force_interpret(False)


def _inputs():
    rng = np.random.default_rng(0)
    left = np.asarray(rng.standard_normal((1, H, W, 3)), np.float32)
    right = np.asarray(rng.standard_normal((1, H, W, 3)), np.float32)
    return left, right


def test_all_fused_paths_match_plain(force_interpret):
    """Every fused section ON (head, stems, volume, agg-stem, mixer) vs
    the plain path, same params."""
    common = dict(cv_scale=4, backbone="mobilenetv2_100",
                  cost_volume="gwc")
    fused_cfg = ESMStereoConfig(
        fuse_backbone_head=True, fuse_stems=True, pallas_volume=True,
        fuse_agg_stem=True, fuse_mixer=True, fuse_hourglass=True,
        fuse_hourglass_up=True,
        **common)
    plain_cfg = ESMStereoConfig(
        fuse_backbone_head=False, fuse_stems=False, pallas_volume=False,
        fuse_agg_stem=False, fuse_mixer=False, fuse_hourglass=False,
        fuse_hourglass_up=False,
        **common)
    fused = ESMStereo(config=fused_cfg)
    plain = ESMStereo(config=plain_cfg)

    left, right = _inputs()
    variables = fused.init(jax.random.key(0), left, right, train=False)

    out_f = fused.apply(variables, left, right, train=False)[0]
    out_p = plain.apply(variables, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-4, atol=2e-3)


def test_fused_agg_stem_cv8_matches_plain(force_interpret):
    """cv8 routes the FULLY fused (in-kernel volume build) stem+agg
    path; the big cv4 test above covers the staged kernel pair."""
    common = dict(cv_scale=8, backbone="efficientnet_b2",
                  cost_volume="gwc")
    fused = ESMStereo(config=ESMStereoConfig(
        fuse_agg_stem=True, pallas_volume=True, fuse_volume_agg=True,
        **common))
    plain = ESMStereo(config=ESMStereoConfig(
        fuse_agg_stem=False, pallas_volume=False, **common))
    left, right = _inputs()
    variables = fused.init(jax.random.key(1), left, right, train=False)
    out_f = fused.apply(variables, left, right, train=False)[0]
    out_p = plain.apply(variables, left, right, train=False)[0]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-4, atol=2e-3)


def test_as7126_gelu_accuracy():
    """The compiled exact-GELU path uses the A&S 7.1.26 erf (Mosaic has
    no erf lowering); bound its deviation from jax's exact gelu."""
    import jax.numpy as jnp

    from esmstereo_tpu.ops.pallas.activations import gelu

    x = jnp.linspace(-10.0, 10.0, 40001, dtype=jnp.float32)
    approx = gelu(x, approximate=False, interpret=False)
    exact = jax.nn.gelu(x, approximate=False)
    # 1.5e-7 erf error * |x|/2 -> ~1e-6 abs at |x|=10
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                               atol=2e-6)
