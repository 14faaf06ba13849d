"""Fused group_stem+agg kernel: interpret mode == FoldedConvBlock3D pair."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.nn.folded3d import FoldedConvBlock3D
from esmstereo_tpu.ops.pallas import fused_agg_stem as fas


class _Pair(nn.Module):
    ci: int = 32
    co: int = 8
    depth: int = 16

    @nn.compact
    def __call__(self, v, *, train=False):
        v = FoldedConvBlock3D(self.co, self.ci, self.depth, 3, 1, 1,
                              name="group_stem")(v, train=train)
        return FoldedConvBlock3D(self.co, self.co, self.depth, 3, 1, 1,
                                 name="agg")(v, train=train)


@pytest.mark.parametrize("ci,depth,h,w", [(32, 16, 8, 16), (8, 16, 12, 8),
                                          (32, 24, 9, 8),
                                          # unaligned width (cv16 grids,
                                          # e.g. 544x960 -> w=60)
                                          (32, 12, 8, 13)])
def test_kernel_matches_folded_pair(rng, ci, depth, h, w):
    vol = jnp.asarray(rng.standard_normal((1, h, w, depth * ci)),
                      jnp.float32)
    pair = _Pair(ci=ci, depth=depth)
    v = pair.init(jax.random.key(0), vol, train=False)
    # non-trivial BN stats so the fold is actually exercised
    stats = jax.tree.map(lambda x: x + 0.3 * np.abs(rng.standard_normal(
        x.shape)).astype(np.float32), v["batch_stats"])
    v = {"params": v["params"], "batch_stats": stats}
    want = pair.apply(v, vol, train=False)

    p, s = v["params"], v["batch_stats"]
    consts = fas.prepare_consts(
        p["group_stem"]["conv"]["Conv_0"]["kernel"],
        (p["group_stem"]["bn"], s["group_stem"]["bn"]),
        p["agg"]["conv"]["Conv_0"]["kernel"],
        (p["agg"]["bn"], s["agg"]["bn"]),
        depth=depth, gelu_approximate=False)
    got = fas.folded_stem_agg_apply(vol, consts, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_kernel_batch2(rng):
    vol = jnp.asarray(rng.standard_normal((2, 8, 8, 16 * 32)), jnp.float32)
    pair = _Pair(ci=32, depth=16)
    v = pair.init(jax.random.key(1), vol, train=False)
    want = pair.apply(v, vol, train=False)
    p, s = v["params"], v["batch_stats"]
    consts = fas.prepare_consts(
        p["group_stem"]["conv"]["Conv_0"]["kernel"],
        (p["group_stem"]["bn"], s["group_stem"]["bn"]),
        p["agg"]["conv"]["Conv_0"]["kernel"],
        (p["agg"]["bn"], s["agg"]["bn"]),
        depth=16, gelu_approximate=False)
    got = fas.folded_stem_agg_apply(vol, consts, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("normalize,groups", [(False, 8), (True, 1)])
def test_volume_fused_kernel_matches_pipeline(rng, normalize, groups):
    """In-kernel volume build + both convs == jnp folded volume ->
    FoldedConvBlock3D pair (the unfused pipeline), descriptors in."""
    from esmstereo_tpu import ops

    c, depth, h, w = 16, 12, 8, 16
    ref = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    if normalize:
        vol = ops.build_norm_correlation_volume_folded(ref, tgt, depth)
    else:
        vol = ops.build_gwc_volume_folded(ref, tgt, depth, groups)

    pair = _Pair(ci=groups, depth=depth)
    v = pair.init(jax.random.key(2), vol, train=False)
    want = pair.apply(v, vol, train=False)

    p, s = v["params"], v["batch_stats"]
    consts = fas.prepare_consts(
        p["group_stem"]["conv"]["Conv_0"]["kernel"],
        (p["group_stem"]["bn"], s["group_stem"]["bn"]),
        p["agg"]["conv"]["Conv_0"]["kernel"],
        (p["agg"]["bn"], s["agg"]["bn"]),
        depth=depth, gelu_approximate=False)
    got = fas.folded_volume_stem_agg_apply(
        ref, tgt, consts, num_groups=groups, normalize=normalize,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_volume_fused_kernel_unaligned_width(rng):
    from esmstereo_tpu import ops

    c, depth, h, w = 16, 12, 8, 13
    ref = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    vol = ops.build_gwc_volume_folded(ref, tgt, depth, 8)
    pair = _Pair(ci=8, depth=depth)
    v = pair.init(jax.random.key(3), vol, train=False)
    want = pair.apply(v, vol, train=False)
    p, s = v["params"], v["batch_stats"]
    consts = fas.prepare_consts(
        p["group_stem"]["conv"]["Conv_0"]["kernel"],
        (p["group_stem"]["bn"], s["group_stem"]["bn"]),
        p["agg"]["conv"]["Conv_0"]["kernel"],
        (p["agg"]["bn"], s["agg"]["bn"]),
        depth=depth, gelu_approximate=False)
    got = fas.folded_volume_stem_agg_apply(
        ref, tgt, consts, num_groups=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_int8_volume_accuracy(rng):
    """int8-quantized volume (per-frame symmetric scale, dequant folded
    into conv1's weights) vs the float path: bounded deviation through
    stem+agg. The experiment's accuracy bound (see ESMStereoConfig
    .volume_int8 and BASELINE.md)."""
    ci, depth, h, w = 32, 16, 8, 16
    vol = jnp.asarray(rng.standard_normal((1, h, w, depth * ci)),
                      jnp.float32)
    pair = _Pair(ci=ci, depth=depth)
    v = pair.init(jax.random.key(0), vol, train=False)
    want = pair.apply(v, vol, train=False)
    p, s = v["params"], v["batch_stats"]
    args = (p["group_stem"]["conv"]["Conv_0"]["kernel"],
            (p["group_stem"]["bn"], s["group_stem"]["bn"]),
            p["agg"]["conv"]["Conv_0"]["kernel"],
            (p["agg"]["bn"], s["agg"]["bn"]))

    vmax = jnp.max(jnp.abs(vol))
    q = jnp.clip(jnp.round(vol * (127.0 / vmax)), -127, 127).astype(jnp.int8)
    consts = fas.prepare_consts(*args, depth=depth, gelu_approximate=False,
                                input_scale=vmax / 127.0)
    got = fas.folded_stem_agg_apply(q, consts, out_dtype=jnp.float32,
                                    interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = float(np.abs(np.asarray(want)).mean())
    assert err.max() < 0.15 * scale + 0.05, (err.max(), scale)
    assert err.mean() < 0.02 * scale + 0.01, (err.mean(), scale)


def test_int8_volume_full_model(rng):
    """volume_int8 through the real model wiring (interpret-mode kernels
    on CPU): disparity deviates from the float fast path by < 1 px bulk."""
    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
    from esmstereo_tpu.ops import pallas as plmod

    base = dict(cv_scale=4, backbone="mobilenetv2_100", cost_volume="gwc")
    m_f = ESMStereo(config=ESMStereoConfig(**base))
    m_q = ESMStereo(config=ESMStereoConfig(volume_int8=True, **base))
    left = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    v = m_f.init(jax.random.key(0), left, right, train=False)
    plmod.set_force_interpret(True)
    try:
        d_f = np.asarray(m_f.apply(v, left, right, train=False)[0])
        d_q = np.asarray(m_q.apply(v, left, right, train=False)[0])
    finally:
        plmod.set_force_interpret(False)
    diff = np.abs(d_f - d_q)
    assert float(np.quantile(diff, 0.95)) < 1.0, np.quantile(diff, 0.95)
