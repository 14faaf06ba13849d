"""Weight-converter test: a synthetic timm-layout state_dict must cover
every backbone parameter and produce matching forward semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmstereo_tpu.backbones import ARCHS, FeaturePyramid
from esmstereo_tpu.backbones.convert_timm import load_timm_backbone
from esmstereo_tpu.backbones.efficientnet import BlockCfg


def _synth_timm_state_dict(arch: str, rng) -> dict:
    """Build a random state_dict with timm's exact key/shape layout."""
    cfg = ARCHS[arch]
    sd = {}

    def conv(name, o, i, k):
        sd[name] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.random(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = \
            rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.random(c).astype(np.float32) + 0.5

    conv("conv_stem.weight", cfg.stem_chs, 3, 3)
    bn("bn1", cfg.stem_chs)
    in_chs = cfg.stem_chs
    for si, stage in enumerate(cfg.stages):
        for bi, b in enumerate(stage):
            p = f"blocks.{si}.{bi}."
            if b.kind == "ds":
                conv(p + "conv_dw.weight", in_chs, 1, b.kernel)
                bn(p + "bn1", in_chs)
                if b.se_ratio > 0:
                    r = max(1, int(in_chs * b.se_ratio))
                    conv(p + "se.conv_reduce.weight", r, in_chs, 1)
                    sd[p + "se.conv_reduce.bias"] = \
                        rng.standard_normal(r).astype(np.float32) * 0.1
                    conv(p + "se.conv_expand.weight", in_chs, r, 1)
                    sd[p + "se.conv_expand.bias"] = \
                        rng.standard_normal(in_chs).astype(np.float32) * 0.1
                conv(p + "conv_pw.weight", b.out_chs, in_chs, 1)
                bn(p + "bn2", b.out_chs)
            else:
                mid = in_chs * b.expand
                conv(p + "conv_pw.weight", mid, in_chs, 1)
                bn(p + "bn1", mid)
                conv(p + "conv_dw.weight", mid, 1, b.kernel)
                bn(p + "bn2", mid)
                if b.se_ratio > 0:
                    r = max(1, int(in_chs * b.se_ratio))
                    conv(p + "se.conv_reduce.weight", r, mid, 1)
                    sd[p + "se.conv_reduce.bias"] = \
                        rng.standard_normal(r).astype(np.float32) * 0.1
                    conv(p + "se.conv_expand.weight", mid, r, 1)
                    sd[p + "se.conv_expand.bias"] = \
                        rng.standard_normal(mid).astype(np.float32) * 0.1
                conv(p + "conv_pwl.weight", b.out_chs, mid, 1)
                bn(p + "bn3", b.out_chs)
            in_chs = b.out_chs
    return sd


@pytest.mark.parametrize("arch", ["mobilenetv2_100", "efficientnet_b2"])
def test_converter_covers_all_backbone_params(arch, rng):
    m = FeaturePyramid(arch=arch)
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.device_get(m.init(jax.random.key(0), x))
    sd = _synth_timm_state_dict(arch, rng)
    new_vars = load_timm_backbone(variables, sd, prefix="")

    # every backbone param leaf must have been replaced
    flat_old = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(
        new_vars["params"])[0])
    n_changed = sum(
        not np.allclose(np.asarray(v), np.asarray(flat_new[k]))
        for k, v in flat_old)
    assert n_changed == len(flat_old), (n_changed, len(flat_old))

    # loaded model still runs and is finite
    feats = m.apply(new_vars, jnp.ones((1, 32, 32, 3)))
    for f in feats:
        assert bool(jnp.isfinite(f).all())


def test_converted_forward_matches_manual_conv(rng):
    """Spot-check the stem: torch-layout weight converted into flax conv
    reproduces the same convolution."""
    import torch
    import torch.nn.functional as F

    m = FeaturePyramid(arch="mobilenetv2_100")
    x_np = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    variables = jax.device_get(m.init(jax.random.key(0), jnp.asarray(x_np)))
    sd = _synth_timm_state_dict("mobilenetv2_100", rng)
    new_vars = load_timm_backbone(variables, sd, prefix="")

    w = torch.from_numpy(sd["conv_stem.weight"])
    want = F.conv2d(torch.from_numpy(x_np).permute(0, 3, 1, 2), w,
                    stride=2, padding=1)
    # apply just the stem conv from the flax tree
    k = jnp.asarray(new_vars["params"]["conv_stem"]["Conv_0"]["kernel"])
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x_np), k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("arch", ["mobilenetv2_100", "efficientnet_b2"])
def test_stub_and_converter_manifests_agree(arch):
    """Cross-assert the two timm encodings against each other.

    Backbone parity (PARITY.md P1) is proven against tests/timm_stub, not
    real timm checkpoints (no timm, zero egress). The stub's architecture
    tables and the Flax side's (backbones/efficientnet.py) could then
    drift — or both encode timm wrong — silently. This pins the one thing
    checkable offline: the stub's ACTUAL state_dict (keys + shapes) must
    be (a) fully consumed by convert_timm (minus the documented skips:
    stage >= 6, num_batches_tracked) and (b) exactly cover every Flax
    backbone leaf, params and batch_stats both ways."""
    import tests.timm_stub as timm_stub

    from esmstereo_tpu.backbones.convert_timm import (
        convert_backbone_state_dict)

    torch_model = timm_stub.create_model(arch)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}

    consumed_params, consumed_stats = convert_backbone_state_dict(sd)

    def flat(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, (*prefix, k)))
            else:
                out["/".join((*prefix, k))] = tuple(v.shape)
        return out

    converted = {**flat(consumed_params), **{"stats/" + k: v
                                             for k, v in
                                             flat(consumed_stats).items()}}
    # (a) every stub tensor is consumed or documented-skipped
    n_expected = sum(
        1 for k in sd
        if "num_batches_tracked" not in k
        and not (k.startswith("blocks.") and int(k.split(".")[1]) >= 6))
    assert len(converted) == n_expected, (len(converted), n_expected)

    # (b) the converted tree covers the Flax backbone tree exactly
    m = FeaturePyramid(arch=arch)
    variables = jax.device_get(m.init(jax.random.key(0),
                                      jnp.zeros((1, 32, 32, 3))))
    model_params = flat(jax.tree_util.tree_map(np.asarray,
                                               variables["params"]))
    model_stats = flat(jax.tree_util.tree_map(np.asarray,
                                              variables["batch_stats"]))
    assert flat(consumed_params) == model_params
    assert flat(consumed_stats) == model_stats
