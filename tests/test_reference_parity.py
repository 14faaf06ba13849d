"""FULL-MODEL numeric parity against the actual torch reference network.

Constructs ``/root/reference/models/ESMStereo.py`` in torch (via the
``tests/timm_stub.py`` backbone stand-in — timm itself is not installed),
transplants its complete random-init ``state_dict`` into the Flax model
with :mod:`esmstereo_tpu.models.convert_reference`, and asserts

  * eval-mode forward equality of the final disparity map,
  * the multi-scale train-output list (``train_status=True``),
  * exact parameter-count equality per variant,

for every (cv_scale, cost-volume) combination the reference supports.
BN running statistics and affine parameters are randomized so normalization
semantics are actually exercised (random-init torch BN is identity-mean).

This is the strongest accuracy-parity evidence available in this
environment (zero dataset egress): any wiring, init-shape, BN-semantics or
padding error anywhere in the net shows up as a numeric mismatch here.

The reference combinations covered (others are structurally broken in the
reference itself — e.g. cv_scale=4 + mobilenetv2 fails inside
``upsample4.ref2x``, whose channel constants are hardwired for
efficientnet_b2, ``ESMStereo.py:247-249``).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import timm_stub  # noqa: E402  (tests dir is on sys.path under pytest)

sys.modules.setdefault("timm", timm_stub)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from esmstereo_tpu.models.convert_reference import (  # noqa: E402
    load_reference_weights)
from esmstereo_tpu.models.esmstereo import (  # noqa: E402
    ESMStereo, ESMStereoConfig)

CONFIGS = [
    # (cv_scale, cost_volume, backbone)
    (4, "gwc", "efficientnet_b2"),
    (4, "norm_correlation", "efficientnet_b2"),
    (8, "gwc", "efficientnet_b2"),
    (8, "norm_correlation", "efficientnet_b2"),
    (16, "gwc", "mobilenetv2_100"),
    (16, "norm_correlation", "mobilenetv2_100"),
]


def _build_torch_reference(cv_scale, cost_volume, backbone, seed=0):
    from models.ESMStereo import ESMStereo as TorchESMStereo

    torch.manual_seed(seed)
    net = TorchESMStereo(192, gwc=cost_volume == "gwc",
                         norm_correlation=cost_volume == "norm_correlation",
                         backbone=backbone, cv_scale=cv_scale)
    # randomize BN affine + running stats so eval-mode normalization is a
    # real transform, not the (0, 1) identity
    g = torch.Generator().manual_seed(seed + 1)
    for m in net.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.weight.data = 0.75 + 0.5 * torch.rand(m.weight.shape,
                                                    generator=g)
            m.bias.data = 0.1 * torch.randn(m.bias.shape, generator=g)
            m.running_mean = 0.1 * torch.randn(m.running_mean.shape,
                                               generator=g)
            m.running_var = 0.5 + torch.rand(m.running_var.shape,
                                             generator=g)
    # Sharpen the cost surface: with random-init weights the aggregated
    # cost spans only ~0.2, so the cv4 top-2 bin selection
    # (submodule.py:218-225) sits on knife-edge margins where 1e-7
    # framework noise flips the selected bins (a discontinuity of top-k,
    # not a parity error). Scaling the hourglass output conv makes the
    # margins dwarf float noise; both nets see the same scaled weights.
    with torch.no_grad():
        net.aggregation_out.conv1_up.conv.weight *= 30.0
    net.eval()
    return net


def _transplanted_pair(cv_scale, cost_volume, backbone, shape,
                       **flax_overrides):
    h, w = shape
    net = _build_torch_reference(cv_scale, cost_volume, backbone)

    cfg = ESMStereoConfig(cost_volume=cost_volume, backbone=backbone,
                          cv_scale=cv_scale, **flax_overrides)
    model = ESMStereo(cfg)
    zeros = jnp.zeros((1, h, w, 3))
    variables = model.init(jax.random.key(0), zeros, zeros)
    variables = load_reference_weights(
        variables, net.state_dict(), cv_scale=cv_scale,
        cost_volume=cost_volume, backbone=backbone)
    return net, model, variables


def _run_both(net, model, variables, shape, train_status=False):
    h, w = shape
    rng = np.random.default_rng(7)
    left = rng.standard_normal((1, 3, h, w)).astype(np.float32)
    right = rng.standard_normal((1, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        t_outs = net(torch.from_numpy(left), torch.from_numpy(right),
                     train_status)
    j_outs = model.apply(variables,
                         jnp.asarray(left.transpose(0, 2, 3, 1)),
                         jnp.asarray(right.transpose(0, 2, 3, 1)),
                         train=False, train_status=train_status)
    return [t.numpy() for t in t_outs], [np.asarray(o) for o in j_outs]


@pytest.mark.parametrize("cv_scale,cost_volume,backbone", CONFIGS)
def test_full_model_parity(cv_scale, cost_volume, backbone):
    shape = (64, 96)
    net, model, variables = _transplanted_pair(cv_scale, cost_volume,
                                               backbone, shape)

    # exact parameter-count parity (reference prints this at startup,
    # train_sceneflow.py:69-70). The reference's count includes the BN
    # affine params of bn=False BasicConvs, which it constructs but never
    # executes (submodule.py:24,30); subtract those dead tensors.
    from models.submodule import BasicConv as TorchBasicConv
    n_dead = sum(m.bn.weight.numel() + m.bn.bias.numel()
                 for m in net.modules()
                 if isinstance(m, TorchBasicConv) and not m.use_bn)
    assert n_dead > 0  # every variant has conv1_up hourglass outputs
    n_torch = sum(p.numel() for p in net.parameters())
    n_flax = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n_torch - n_dead == n_flax, (n_torch, n_dead, n_flax)

    t_outs, j_outs = _run_both(net, model, variables, shape)
    assert len(t_outs) == len(j_outs) == 1
    scale = max(1.0, float(np.abs(t_outs[0]).max()))
    err = float(np.abs(t_outs[0] - j_outs[0]).max()) / scale
    assert err < 1e-4, f"relative disparity mismatch {err:.2e}"


@pytest.mark.parametrize("cv_scale,cost_volume,backbone",
                         [(4, "gwc", "efficientnet_b2"),
                          (16, "norm_correlation", "mobilenetv2_100")])
def test_full_model_parity_train_outputs(cv_scale, cost_volume, backbone):
    """Multi-scale training-output list parity (eval-mode BN)."""
    shape = (64, 96)
    net, model, variables = _transplanted_pair(cv_scale, cost_volume,
                                               backbone, shape)
    t_outs, j_outs = _run_both(net, model, variables, shape,
                               train_status=True)
    assert len(t_outs) == len(j_outs) == (3 if cv_scale == 8 else 2)
    for k, (t, j) in enumerate(zip(t_outs, j_outs)):
        scale = max(1.0, float(np.abs(t).max()))
        err = float(np.abs(t - j).max()) / scale
        assert err < 1e-4, f"output {k}: relative mismatch {err:.2e}"


def test_full_model_parity_second_shape_and_plain_path():
    """One config at a second /32 shape, with every TPU fast path disabled
    (reference-layout NDHWC execution) — separates transplant errors from
    fast-path errors if the defaults-path test ever fails.

    Uses cv8 because its full soft-argmin regression is continuous; cv4's
    top-2 selection flips bins at knife-edge pixels under 1e-6 framework
    noise (~1% of pixels at this size even after the margin sharpening in
    ``_build_torch_reference``), which is a property of top-k, not a
    parity defect."""
    shape = (96, 160)
    net, model, variables = _transplanted_pair(
        8, "gwc", "efficientnet_b2", shape,
        fold_depth=False, phase_fold_upsample=False, siamese_batch=False,
        fuse_backbone_head=False, pallas_volume=False)
    t_outs, j_outs = _run_both(net, model, variables, shape)
    scale = max(1.0, float(np.abs(t_outs[0]).max()))
    err = float(np.abs(t_outs[0] - j_outs[0]).max()) / scale
    assert err < 1e-4, f"relative disparity mismatch {err:.2e}"


def test_confidence_variant_full_parity():
    """Full-model parity for ESMStereo_confidence (LAFNet head +
    conf_upsample, ``ESMStereo_confidence.py:746-976``): transplant the
    complete state_dict and compare BOTH outputs (disparity + confidence).
    cv16 uses the smooth full soft-argmin regression, so no top-k
    knife-edge caveat applies."""
    from models.ESMStereo_confidence import ESMStereo_confidence

    from esmstereo_tpu.models.confidence import ESMStereoConfidence

    shape = (64, 96)
    torch.manual_seed(5)
    net = ESMStereo_confidence(192, gwc=False, norm_correlation=True,
                               backbone="mobilenetv2_100", cv_scale=16,
                               device=torch.device("cpu"))
    g = torch.Generator().manual_seed(6)
    for m in net.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.weight.data = 0.75 + 0.5 * torch.rand(m.weight.shape,
                                                    generator=g)
            m.bias.data = 0.1 * torch.randn(m.bias.shape, generator=g)
            m.running_mean = 0.1 * torch.randn(m.running_mean.shape,
                                               generator=g)
            m.running_var = 0.5 + torch.rand(m.running_var.shape,
                                             generator=g)
    # keep the reference's deliberate zero-init on the sampling-scale BN
    # (ESMStereo_confidence.py:641-642), which our flax head mirrors
    with torch.no_grad():
        net.confidence_net.scale_bn3.weight.zero_()
        net.confidence_net.scale_bn3.bias.zero_()
    net.eval()

    cfg = ESMStereoConfig(cost_volume="norm_correlation",
                          backbone="mobilenetv2_100", cv_scale=16)
    model = ESMStereoConfidence(config=cfg)
    zeros = jnp.zeros((1, *shape, 3))
    variables = model.init(jax.random.key(0), zeros, zeros)
    variables = load_reference_weights(
        variables, net.state_dict(), cv_scale=16,
        cost_volume="norm_correlation", backbone="mobilenetv2_100",
        confidence=True)

    rng = np.random.default_rng(9)
    left = rng.standard_normal((1, 3, *shape)).astype(np.float32)
    right = rng.standard_normal((1, 3, *shape)).astype(np.float32)
    with torch.no_grad():
        t_disp, t_conf = net(torch.from_numpy(left), torch.from_numpy(right))
    j_disp, j_conf = model.apply(
        variables, jnp.asarray(left.transpose(0, 2, 3, 1)),
        jnp.asarray(right.transpose(0, 2, 3, 1)), train=False)

    d_scale = max(1.0, float(np.abs(t_disp.numpy()).max()))
    err_d = float(np.abs(t_disp.numpy() - np.asarray(j_disp)).max()) / d_scale
    assert err_d < 1e-4, f"disparity mismatch {err_d:.2e}"
    err_c = float(np.abs(t_conf.numpy() - np.asarray(j_conf)).max())
    assert err_c < 1e-4, f"confidence mismatch {err_c:.2e}"  # conf in [0,1]


def test_trt_variant_matches_eval_path():
    """ESMStereo_trt is byte-identical to ESMStereo except the forward
    signature/return (ESMStereo_trt.py:638,735); its state_dict transplants
    through the same mapping and must match our eval path."""
    from models.ESMStereo_trt import ESMStereo_trt

    shape = (64, 96)
    torch.manual_seed(3)
    net = ESMStereo_trt(192, gwc=True, norm_correlation=False,
                        backbone="efficientnet_b2", cv_scale=4)
    net.eval()

    cfg = ESMStereoConfig(cost_volume="gwc", backbone="efficientnet_b2",
                          cv_scale=4)
    model = ESMStereo(cfg)
    zeros = jnp.zeros((1, *shape, 3))
    variables = model.init(jax.random.key(0), zeros, zeros)
    variables = load_reference_weights(
        variables, net.state_dict(), cv_scale=4, cost_volume="gwc",
        backbone="efficientnet_b2")

    rng = np.random.default_rng(11)
    left = rng.standard_normal((1, 3, *shape)).astype(np.float32)
    right = rng.standard_normal((1, 3, *shape)).astype(np.float32)
    with torch.no_grad():
        t_out = net(torch.from_numpy(left), torch.from_numpy(right)).numpy()
    j_out = np.asarray(model.apply(
        variables, jnp.asarray(left.transpose(0, 2, 3, 1)),
        jnp.asarray(right.transpose(0, 2, 3, 1)), train=False)[0])
    scale = max(1.0, float(np.abs(t_out).max()))
    assert float(np.abs(t_out - j_out).max()) / scale < 1e-4
