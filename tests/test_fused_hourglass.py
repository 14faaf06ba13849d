"""Fused hourglass down-pair kernel: interpret mode == FoldedConvBlock3D
(s2, s1) pair."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.nn.folded3d import FoldedConvBlock3D
from esmstereo_tpu.attic import fused_hourglass as fh


class _Level(nn.Module):
    """One hourglass down level (matches models/folded_agg.py block())."""

    ci: int
    co: int
    depth: int

    @nn.compact
    def __call__(self, x, *, train=False):
        d1 = (self.depth + 1) // 2
        x = FoldedConvBlock3D(self.co, self.ci, self.depth, 3, 2, 1,
                              depth_block=8, name="c0")(x, train=train)
        return FoldedConvBlock3D(self.co, self.co, d1, 3, 1, 1,
                                 depth_block=8, name="c1")(x, train=train)


# the real L-variant level channel/depth configs at reduced spatial size,
# plus an odd-ho and an unaligned-width case
@pytest.mark.parametrize("ci,co,depth,h,w", [
    (8, 24, 48, 16, 32),     # level 1 (in 8ch, d48)
    (24, 40, 24, 16, 16),    # level 2
    (40, 56, 12, 6, 16),     # level 3 (ho = 3, odd)
    (8, 24, 16, 10, 12),     # wo = 6: unaligned paired width
])
def test_kernel_matches_level_pair(rng, ci, co, depth, h, w):
    x = jnp.asarray(rng.standard_normal((1, h, w, depth * ci)), jnp.float32)
    lvl = _Level(ci=ci, co=co, depth=depth)
    v = lvl.init(jax.random.key(0), x, train=False)
    stats = jax.tree.map(lambda a: a + 0.3 * np.abs(rng.standard_normal(
        a.shape)).astype(np.float32), v["batch_stats"])
    v = {"params": v["params"], "batch_stats": stats}
    want = lvl.apply(v, x, train=False)

    p, s = v["params"], v["batch_stats"]
    consts = fh.prepare_pair_consts(
        p["c0"]["conv"]["Conv_0"]["kernel"], (p["c0"]["bn"], s["c0"]["bn"]),
        p["c1"]["conv"]["Conv_0"]["kernel"], (p["c1"]["bn"], s["c1"]["bn"]),
        depth=depth, gelu_approximate=False)
    got = fh.fused_down_pair_apply(x, consts, interpret=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_kernel_batch2(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16 * 8)), jnp.float32)
    lvl = _Level(ci=8, co=24, depth=16)
    v = lvl.init(jax.random.key(1), x, train=False)
    want = lvl.apply(v, x, train=False)
    p, s = v["params"], v["batch_stats"]
    consts = fh.prepare_pair_consts(
        p["c0"]["conv"]["Conv_0"]["kernel"], (p["c0"]["bn"], s["c0"]["bn"]),
        p["c1"]["conv"]["Conv_0"]["kernel"], (p["c1"]["bn"], s["c1"]["bn"]),
        depth=16, gelu_approximate=False)
    got = fh.fused_down_pair_apply(x, consts, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_full_hourglass_fused_matches_plain(rng):
    """fuse_pairs=True through the real FoldedAggregation3D (interpret
    kernels on CPU) == the plain module, same params."""
    from esmstereo_tpu.models.folded_agg import FoldedAggregation3D
    from esmstereo_tpu.ops import pallas as plmod

    x = jnp.asarray(rng.standard_normal((1, 16, 24, 16 * 8)), jnp.float32)
    plain = FoldedAggregation3D(8, 4, 16)
    fused = FoldedAggregation3D(8, 4, 16, fuse_pairs=True, fuse_up=True)
    v = plain.init(jax.random.key(0), x, train=False)
    want = plain.apply(v, x, train=False)
    plmod.set_force_interpret(True)
    try:
        got = fused.apply(v, x, train=False)
    finally:
        plmod.set_force_interpret(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


class _UpLevel(nn.Module):
    """One hourglass up level (matches models/folded_agg.py up path)."""

    ci_u: int       # deconv in channels (c_{k+1})
    co: int         # level channels (c_k)
    d_s: int        # deconv input depth
    d2: int         # level depth (crop target)

    @nn.compact
    def __call__(self, src, skip, *, train=False):
        from esmstereo_tpu.models.folded_agg import _crop_folded
        from esmstereo_tpu.nn.phasefold import interleave_indices

        up = FoldedConvBlock3D(self.co, self.ci_u, self.d_s, 4, 2, 1,
                               deconv=True, depth_block=8,
                               name="up")(src, train=train)
        up = _crop_folded(up, skip.shape[1], skip.shape[2], self.d2,
                          self.co)
        x = jnp.concatenate([up, skip], axis=-1)
        x = FoldedConvBlock3D(self.co, 2 * self.co, self.d2, 1, 1, 0,
                              depth_block=None,
                              in_perm=interleave_indices(
                                  self.d2, [self.co, self.co]),
                              name="cat")(x, train=train)
        return FoldedConvBlock3D(self.co, self.co, self.d2, 3, 1, 1,
                                 depth_block=8, name="c3")(x, train=train)


@pytest.mark.parametrize("ci_u,co,d_s,d2,hs,ws", [
    (56, 40, 6, 12, 5, 8),    # L level 3->2 config (reduced spatial)
    (40, 24, 12, 24, 6, 8),   # L level 2->1
    (16, 8, 2, 3, 4, 4),      # depth crop (2*d_s=4 -> 3), small
])
def test_up_kernel_matches_level(rng, ci_u, co, d_s, d2, hs, ws):
    src = jnp.asarray(rng.standard_normal((1, hs, ws, d_s * ci_u)),
                      jnp.float32)
    skip = jnp.asarray(rng.standard_normal((1, 2 * hs, 2 * ws, d2 * co)),
                       jnp.float32)
    lvl = _UpLevel(ci_u=ci_u, co=co, d_s=d_s, d2=d2)
    v = lvl.init(jax.random.key(0), src, skip, train=False)
    stats = jax.tree.map(lambda a: a + 0.3 * np.abs(rng.standard_normal(
        a.shape)).astype(np.float32), v["batch_stats"])
    v = {"params": v["params"], "batch_stats": stats}
    want = lvl.apply(v, src, skip, train=False)

    from esmstereo_tpu.nn.phasefold import interleave_indices
    p, s = v["params"], v["batch_stats"]
    consts = fh.prepare_up_consts(
        p["up"]["conv"]["kernel"], (p["up"]["bn"], s["up"]["bn"]),
        p["cat"]["conv"]["Conv_0"]["kernel"],
        (p["cat"]["bn"], s["cat"]["bn"]),
        p["c3"]["conv"]["Conv_0"]["kernel"], (p["c3"]["bn"], s["c3"]["bn"]),
        depth_in=d_s, depth_out=d2,
        in_perm=interleave_indices(d2, [co, co]),
        gelu_approximate=False)
    got = fh.fused_up_pair_apply(src, skip, consts, interpret=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
