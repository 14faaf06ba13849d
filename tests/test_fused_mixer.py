"""Fused ShuffleMixer-section kernel: interpret-mode == plain modules."""

import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu.models.phased_upsample import PhUpsample4, PhUpStage2x
from esmstereo_tpu.attic import fused_mixer as fm


def _plain_section_module():
    """to_feat -> FMBlock x2 -> PhPixelShuffleUp composed from the plain
    modules (the pre-kernel formulation of PhUpStage2x's interior)."""
    import flax.linen as nn

    from esmstereo_tpu.models.phased_upsample import PhPixelShuffleUp
    from esmstereo_tpu.nn.blocks import TorchConv
    from esmstereo_tpu.nn.shufflemixer import FMBlock

    class Section(nn.Module):
        dtype: object = None

        @nn.compact
        def __call__(self, x):
            dt = self.dtype
            x = TorchConv(16, 3, 1, 1, dtype=dt, name="to_feat")(x)
            x = FMBlock(16, 7, 2, dtype=dt, name="block0")(x)
            x = FMBlock(16, 7, 2, dtype=dt, name="block1")(x)
            return PhPixelShuffleUp(16, 16, 1, dtype=dt, name="up")(x)

    return Section()


def test_reference_matches_plain_modules(rng):
    """mixer_reference (the twin's CPU/init fallback) == plain modules."""
    x = jnp.asarray(rng.standard_normal((1, 12, 24, 32)), jnp.float32)
    plain = _plain_section_module()
    v = plain.init(jax.random.key(0), x)
    want = plain.apply(v, x)
    got = fm.mixer_reference(x, v["params"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_matches_plain_modules(rng):
    """Interpret-mode Pallas kernel == plain modules (fp32 matmuls)."""
    x = jnp.asarray(rng.standard_normal((1, 12, 24, 32)), jnp.float32)
    plain = _plain_section_module()
    v = plain.init(jax.random.key(0), x)
    want = plain.apply(v, x)
    consts = fm.prepare_consts(v["params"], width=x.shape[2])
    got = fm.fused_mixer_apply(x, consts, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_kernel_batch2_and_width(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 32)), jnp.float32)
    plain = _plain_section_module()
    v = plain.init(jax.random.key(0), x)
    want = plain.apply(v, x)
    consts = fm.prepare_consts(v["params"], width=x.shape[2])
    got = fm.fused_mixer_apply(x, consts, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_stage2x_twin_param_tree_and_fallback(rng):
    """PhUpStage2x's holder-based tree == the pre-kernel module tree, and
    the CPU fallback output is unchanged."""
    h4, w4 = 8, 16
    f1x = jnp.asarray(rng.standard_normal((1, h4 // 2, w4 // 2, 96)),
                      jnp.float32)
    f2x = jnp.asarray(rng.standard_normal((1, h4, w4, 48)), jnp.float32)
    disp = jnp.asarray(rng.standard_normal((1, h4, w4, 1)), jnp.float32)

    stage = PhUpStage2x()
    v = stage.init(jax.random.key(0), f1x, f2x, disp, train=False)
    paths = {jax.tree_util.keystr(p): tuple(l.shape)
             for p, l in jax.tree_util.tree_flatten_with_path(
                 v["params"])[0]}
    # the mixer subtree must sit at the plain modules' paths
    assert "['to_feat']['Conv_0']['kernel']" in paths
    assert paths["['to_feat']['Conv_0']['kernel']"] == (3, 3, 32, 16)
    assert "['block0']['sm1']['norm1']['weight']" in paths
    assert "['block1']['conv_expand']['Conv_0']['bias']" in paths
    assert paths["['up']['conv']['Conv_0']['kernel']"] == (1, 1, 16, 64)
    out = stage.apply(v, f1x, f2x, disp, train=False)
    assert out.shape == (1, h4, w4, 4)
    assert np.isfinite(np.asarray(out)).all()
