"""shard_map'd Pallas kernels == single-device kernels on the CPU mesh.

Round-5 feature (VERDICT r4 #3): the spatial mesh used to force the plain
XLA formulation (spatial_safe_config turned every kernel off); these tests
pin the shard_map wrappers (parallel.shard_kernels) to the monolithic
kernels, boundary rows included, on the fake 8-device CPU mesh in
interpret mode.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from esmstereo_tpu.nn.folded3d import FoldedConvBlock3D
from esmstereo_tpu.ops.pallas import correlation as pkcorr
from esmstereo_tpu.ops.pallas import fused_agg_stem as fas
from esmstereo_tpu.parallel import mesh as pmesh
from esmstereo_tpu.parallel import shard_kernels as sk


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


def _consts(rng, ci, depth, h, w):
    vol = jnp.asarray(rng.standard_normal((2, h, w, depth * ci)),
                      jnp.float32)
    pair = _Pair(ci=ci, depth=depth)
    v = pair.init(jax.random.key(0), vol, train=False)
    stats = jax.tree.map(lambda x: x + 0.3 * np.abs(rng.standard_normal(
        x.shape)).astype(np.float32), v["batch_stats"])
    v = {"params": v["params"], "batch_stats": stats}
    p, s = v["params"], v["batch_stats"]
    consts = fas.prepare_consts(
        p["group_stem"]["conv"]["Conv_0"]["kernel"],
        (p["group_stem"]["bn"], s["group_stem"]["bn"]),
        p["agg"]["conv"]["Conv_0"]["kernel"],
        (p["agg"]["bn"], s["agg"]["bn"]),
        depth=depth, gelu_approximate=False)
    return vol, consts, pair, v


def test_halo_slab_matches_monolithic(rng):
    """The kernel's halo/row0/h_global mode on hand-built slabs ==
    the monolithic call (no mesh — isolates the kernel change)."""
    vol, consts, *_ = _consts(rng, ci=32, depth=16, h=16, w=16)
    want = fas.folded_stem_agg_apply(vol, consts, interpret=True)
    h = vol.shape[1]
    n = 4
    hl = h // n
    padded = jnp.pad(vol, ((0, 0), (2, 2), (0, 0), (0, 0)))
    parts = []
    for i in range(n):
        slab = padded[:, i * hl: i * hl + hl + 4]
        parts.append(fas.folded_stem_agg_apply(
            slab, consts, interpret=True, halo=2, row0=i * hl,
            h_global=h))
    got = jnp.concatenate(parts, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("spatial", [2, 4])
def test_sharded_stem_agg_matches(rng, spatial):
    vol, consts, *_ = _consts(rng, ci=32, depth=16, h=16, w=16)
    want = fas.folded_stem_agg_apply(vol, consts, interpret=True)
    mesh = pmesh.make_mesh(pmesh.MeshConfig(data=2, spatial=spatial),
                           devices=jax.devices()[: 2 * spatial])
    vs = jax.device_put(vol, NamedSharding(mesh, P("data", "spatial")))
    got = jax.jit(lambda v: sk.sharded_folded_stem_agg(
        v, consts, mesh, interpret=True))(vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("normalize,groups", [(False, 8), (True, 1)])
def test_sharded_correlation_matches(rng, normalize, groups):
    c, max_disp, h, w = 16, 16, 16, 24
    ref = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    want = pkcorr.correlation_volume_folded(ref, tgt, max_disp, groups,
                                            normalize=normalize,
                                            interpret=True)
    mesh = pmesh.make_mesh(pmesh.MeshConfig(data=2, spatial=4),
                           devices=jax.devices()[:8])
    s = NamedSharding(mesh, P("data", "spatial"))
    got = jax.jit(lambda r, t: sk.sharded_correlation_volume_folded(
        r, t, max_disp, groups, mesh, normalize=normalize,
        interpret=True))(jax.device_put(ref, s), jax.device_put(tgt, s))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sharded_model_forward_kernels_on(rng):
    """Full eval forward with shard_kernels=True (spatial mesh, kernels
    dispatched through shard_map) vs the monolithic kernels-on model.

    The pre-regression cost volume must match tightly; the full-res
    output is bounded like tests/test_parallel.py's oracle (cv4's top-2
    regression flips near-tied bins under fp32 reassociation)."""
    from esmstereo_tpu.data.synthetic import make_batch
    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
    from esmstereo_tpu.ops import pallas as plmod

    plmod.set_force_interpret(True)
    try:
        mesh = pmesh.make_mesh(pmesh.MeshConfig(data=2, spatial=4))
        cfg_mono = ESMStereoConfig(cv_scale=4, backbone="mobilenetv2_100",
                                   cost_volume="gwc",
                                   fuse_backbone_head=False)
        cfg_shard = pmesh.spatial_safe_config(cfg_mono, mesh,
                                              shard_kernels=True)
        assert cfg_shard.pallas_volume and cfg_shard.fuse_agg_stem
        assert cfg_shard.shard_mesh is mesh
        model_m = ESMStereo(config=cfg_mono)
        model_s = ESMStereo(config=cfg_shard)

        b = make_batch(np.random.default_rng(3), batch=2, h=64, w=64,
                       disp_range=(4, 10))
        left = jnp.asarray(b["left"])
        right = jnp.asarray(b["right"])
        variables = model_m.init(jax.random.key(0), left, right,
                                 train=False)

        want, aux_w = jax.jit(lambda v, l, r: model_m.apply(
            v, l, r, train=False, capture_internals=True))(
            variables, left, right)
        bs = pmesh.batch_sharding(mesh)
        got, aux_g = jax.jit(lambda v, l, r: model_s.apply(
            v, l, r, train=False, capture_internals=True))(
            jax.device_put(variables, pmesh.replicated(mesh)),
            jax.device_put(left, bs), jax.device_put(right, bs))

        np.testing.assert_allclose(np.asarray(aux_g["cost"]),
                                   np.asarray(aux_w["cost"]),
                                   rtol=2e-4, atol=2e-3)
        diff = np.abs(np.asarray(got[0]) - np.asarray(want[0]))
        assert np.quantile(diff, 0.95) < 2e-3, np.quantile(diff, 0.95)
        assert diff.max() < 2.0, diff.max()
    finally:
        plmod.set_force_interpret(False)
