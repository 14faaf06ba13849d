"""ESMStereo confidence variant: LAFNet-style confidence estimation head.

Reference: ``/root/reference/models/ESMStereo_confidence.py:511-976``. The
confidence head is only wired for ``cv_scale=16`` (S variant,
``:868-871,966-972``): it consumes the squeezed cost volume, the initial
/16 disparity, the matching descriptor, and two pyramid features, and
produces a full-resolution confidence map in [0, 1].

Faithfully kept reference quirks:
  * the enlarged sampling grid scales the x-offset by ``2/(w-1)`` but the
    y-offset by the raw scale (``:707-715``);
  * three fusion iterations share conv weights but use per-iteration
    BatchNorms (``:616-627``);
  * the scale head's final BN is zero-initialised so sampling starts at
    scale 1 (``:641-642``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu import ops
from esmstereo_tpu.models.esmstereo import (
    ESMStereo,
    ESMStereoConfig,
)
from esmstereo_tpu.nn import init as tinit
from esmstereo_tpu.nn.blocks import ConvBlock, TorchConv

Array = jax.Array


def build_enlarged_grid(scale: Array) -> Array:
    """3x enlarged sampling grid (``ESMStereo_confidence.py:695-715``).

    ``scale``: (B, h, w) learned per-pixel scale. Output normalised grid
    ``(B, 3h, 3w, 2)`` with the reference's asymmetric offset scaling:
    x-offset ``dx * 2/(w-1) * scale``, y-offset ``dy * scale``.
    """
    b, h, w = scale.shape
    base_x = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, w)[None, None, :],
                              (b, h, w))[:, :, None, :, None]
    base_y = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, h)[None, :, None],
                              (b, h, w))[:, :, None, :, None]
    sc = scale[:, :, None, :, None]                  # (B, h, 1, w, 1)
    taps = jnp.asarray([-1.0, 0.0, 1.0])
    step_y = 2.0 / (w - 1)
    x = base_x + taps.reshape(1, 1, 1, 1, 3) * step_y * sc
    y = base_y + taps.reshape(1, 1, 3, 1, 1) * sc
    x = jnp.broadcast_to(x, (b, h, 3, w, 3))
    y = jnp.broadcast_to(y, (b, h, 3, w, 3))
    return jnp.stack([x, y], axis=-1).reshape(b, 3 * h, 3 * w, 2)


def _bn(train: bool, dtype, name: str, zero_init: bool = False):
    kwargs = {}
    if zero_init:
        kwargs = dict(scale_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name, **kwargs)


class _ConvBnRelu3(nn.Module):
    """The 3-conv (k3,k3,k1) + BN + ReLU feature extractor pattern."""

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        c = self.channels
        x = TorchConv(c, 3, 1, 1, use_bias=True, init_mode="kaiming_relu",
                      dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(_bn(train, self.dtype, "bn1")(x))
        x = TorchConv(c, 3, 1, 1, use_bias=True, init_mode="kaiming_relu",
                      dtype=self.dtype, name="conv2")(x)
        x = jax.nn.relu(_bn(train, self.dtype, "bn2")(x))
        x = TorchConv(c, 1, 1, 0, use_bias=True, init_mode="kaiming_relu",
                      dtype=self.dtype, name="conv3")(x)
        return jax.nn.relu(_bn(train, self.dtype, "bn3")(x))


class _AttHead(nn.Module):
    """2-conv attention logit head (C -> C -> 1)."""

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = TorchConv(self.channels, 3, 1, 1, use_bias=True,
                      init_mode="kaiming_relu", dtype=self.dtype,
                      name="conv1")(x)
        x = jax.nn.relu(_bn(train, self.dtype, "bn1")(x))
        x = TorchConv(1, 1, 1, 0, use_bias=True, init_mode="kaiming_relu",
                      dtype=self.dtype, name="conv2")(x)
        return _bn(train, self.dtype, "bn2")(x)


class ConfUpsample(nn.Module):
    """x4 confidence upsampling stage (``ESMStereo_confidence.py:511-548``).

    Context-upsamples the confidence with learned softmax weights, then
    adds a small conv-hourglass residual.
    """

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat: Array, init_conf: Array,
                 *, train: bool = False) -> Array:
        c = self.channels
        x = init_conf
        # cm: dm-style stack (k5p1, k3p1, k3p1, k1p1)
        f = ConvBlock(c, 5, 1, 1, dtype=self.dtype, name="cm0")(x, train=train)
        f = ConvBlock(c, 3, 1, 1, dtype=self.dtype, name="cm1")(f, train=train)
        f = ConvBlock(c, 3, 1, 1, dtype=self.dtype, name="cm2")(f, train=train)
        f = ConvBlock(c, 1, 1, 1, dtype=self.dtype, name="cm3")(f, train=train)

        fused = ConvBlock(c, 3, 1, 1, dtype=self.dtype, name="spx4_0")(
            jnp.concatenate([f, feat], axis=-1), train=train)
        fused = TorchConv(c, 3, 1, 1, dtype=self.dtype, name="spx4_1")(fused)
        fused = jax.nn.relu(_bn(train, self.dtype, "spx4_bn")(fused))

        # ConvTranspose(C -> 9, k4 s4 p0): exact x4 with torch arithmetic
        from esmstereo_tpu.nn.blocks import TorchConvTranspose
        weights = TorchConvTranspose(9, 4, 4, 0, use_bias=True,
                                     dtype=self.dtype, name="spx")(fused)
        sfm = jax.nn.softmax(weights, axis=-1)

        conf1 = ops.context_upsample(init_conf, sfm, scale=4)
        conf = ConvBlock(c, 3, 1, 1, dtype=self.dtype,
                         name="conv1")(conf1, train=train)
        conf = ConvBlock(c, 3, 2, 1, dtype=self.dtype,
                         name="conv2")(conf, train=train)
        conf = ConvBlock(1, 4, 2, 1, deconv=True, dtype=self.dtype,
                         name="conv1_up")(conf, train=train)
        return conf + conf1


class _SpxParams(nn.Module):
    """Parameters of the ``spx`` ConvTranspose(C -> 9, k4 s4 p0) at
    TorchConvTranspose-compatible paths (``<name>/kernel``, ``/bias``)."""

    in_channels: int

    @nn.compact
    def __call__(self):
        fan_in = 9 * 16  # out_channels * prod(kernel), torch deconv fan-in
        bound = float(1.0 / np.sqrt(fan_in))

        def kinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kinit, (4, 4, self.in_channels, 9))
        bias = self.param("bias", tinit.torch_conv_bias(fan_in), (9,))
        return kernel, bias


class PhConfUpsample(nn.Module):
    """Phase-folded twin of ``ConfUpsample`` (TPU eval fast path).

    The coarse section (cm stack + spx fusion convs) already runs on the
    base grid and is kept as-is; the fine-resolution section is
    re-expressed in phase space (``nn.phasefold``) so no small-channel
    full-resolution conv ever executes:

      * the ``spx`` ConvTranspose (k4 s4 p0) is non-overlapping, hence
        exactly a per-phase 1x1 conv producing the 16 x 9 softmax weights
        phase-major on the base grid;
      * ``context_upsample`` becomes a 9-tap weighted sum against the
        coarse 3x3 neighbourhood (``ops.unfold3x3``) — the full-res
        9-channel weight tensor is never materialised;
      * conv1 (full-res k3) / conv2 (stride 2) / conv1_up (x2 deconv) are
        phase-folded convs at phases 4 -> 4 -> 2 -> 4.

    Parameter tree is path-compatible with ``ConfUpsample``; the return
    value is the PHASED (B, h, w, 16) confidence (``from_phases`` at the
    caller). Eval-only like the phased disparity upsampler (per-channel
    folded BN is exact for running stats). Equivalence:
    tests/test_confidence.py::test_phased_conf_upsample_matches_plain.
    """

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat: Array, init_conf: Array,
                 *, train: bool = False, capture: dict | None = None,
                 tag: str = "") -> Array:
        from esmstereo_tpu.models.phased_upsample import PhConvBlock

        def _cap(name, value):
            if capture is not None:
                capture[f"{tag}{name}"] = value

        c = self.channels
        x = init_conf
        f = ConvBlock(c, 5, 1, 1, dtype=self.dtype, name="cm0")(x, train=train)
        f = ConvBlock(c, 3, 1, 1, dtype=self.dtype, name="cm1")(f, train=train)
        f = ConvBlock(c, 3, 1, 1, dtype=self.dtype, name="cm2")(f, train=train)
        f = ConvBlock(c, 1, 1, 1, dtype=self.dtype, name="cm3")(f, train=train)

        fused = ConvBlock(c, 3, 1, 1, dtype=self.dtype, name="spx4_0")(
            jnp.concatenate([f, feat], axis=-1), train=train)
        fused = TorchConv(c, 3, 1, 1, dtype=self.dtype, name="spx4_1")(fused)
        fused = jax.nn.relu(_bn(train, self.dtype, "spx4_bn")(fused))
        _cap("fused", fused)

        # spx ConvTranspose(k4 s4 p0): out[4i+qy, 4j+qx] = W[qy,qx] @ in[i,j]
        # — a pure per-phase 1x1 conv on the base grid.
        ci = fused.shape[-1]
        w, b = _SpxParams(ci, name="spx")()
        w_ph = jnp.transpose(w, (2, 0, 1, 3)).reshape(1, 1, ci, 16 * 9)
        dt = self.dtype or fused.dtype
        dn = jax.lax.conv_dimension_numbers(
            fused.shape, w_ph.shape, ("NHWC", "HWIO", "NHWC"))
        logits = jax.lax.conv_general_dilated(
            fused.astype(dt), w_ph.astype(dt), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=dn)
        logits = logits + jnp.tile(b, 16).astype(logits.dtype)

        bsz, h, wdt, _ = logits.shape
        sfm = jax.nn.softmax(
            logits.reshape(bsz, h, wdt, 16, 9), axis=-1)
        taps = ops.unfold3x3(init_conf)                      # (B, h, w, 9)
        conf1_ph = jnp.sum(sfm * taps[..., None, :].astype(sfm.dtype),
                           axis=-1)                          # (B, h, w, 16)
        _cap("conf1", conf1_ph)

        conf = PhConvBlock(c, 1, 3, 1, 4, 4, dtype=self.dtype,
                           name="conv1")(conf1_ph, train=train)
        conf = PhConvBlock(c, c, 3, 1, 4, 2, dtype=self.dtype,
                           name="conv2")(conf, train=train)
        conf = PhConvBlock(1, c, 4, 1, 2, 4, mode="deconv", dtype=self.dtype,
                           name="conv1_up")(conf, train=train)
        return conf + conf1_ph


class LAFNetHead(nn.Module):
    """LAFNet confidence head (``ESMStereo_confidence.py:551-744``)."""

    channels: int = 16
    # Execute the ConfUpsample fine-resolution sections in phase space on
    # their base grids (eval only, param-compatible; see PhConfUpsample).
    phase_up: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, cost: Array, disp: Array, imag: Array, f1: Array,
                 f2: Array, *, train: bool = False,
                 capture: dict | None = None) -> Array:
        c = self.channels
        b, num_d, h, w = cost.shape

        def _cap(name, value):
            if capture is not None:
                capture[name] = value

        # top-7 of the softmaxed, L2-normalised (over D), sharpened cost
        cost_bhwd = jnp.moveaxis(cost, 1, -1)
        norm = jnp.sqrt(jnp.sum(cost_bhwd ** 2, axis=-1, keepdims=True)
                        + 1e-6)
        x = jax.nn.softmax(-(cost_bhwd / norm) * 100.0, axis=-1)
        topv, _ = jax.lax.top_k(x, 7)  # (B, H, W, 7)
        _cap("topv", topv)

        cost_x = _ConvBnRelu3(c, dtype=self.dtype, name="cost_feat")(
            topv, train=train)
        disp_x = _ConvBnRelu3(c, dtype=self.dtype, name="disp_feat")(
            disp, train=train)
        imag_x = _ConvBnRelu3(c, dtype=self.dtype, name="imag_feat")(
            imag, train=train)

        atts = jnp.concatenate([
            _AttHead(c, dtype=self.dtype, name="cost_att")(cost_x, train=train),
            _AttHead(c, dtype=self.dtype, name="disp_att")(disp_x, train=train),
            _AttHead(c, dtype=self.dtype, name="imag_att")(imag_x, train=train),
        ], axis=-1)
        atts = jax.nn.softmax(atts, axis=-1)

        x = jnp.concatenate([
            cost_x * atts[..., 0:1],
            disp_x * atts[..., 1:2],
            imag_x * atts[..., 2:3],
        ], axis=-1)
        feat = TorchConv(c, 3, 1, 1, use_bias=True, init_mode="kaiming_relu",
                         dtype=self.dtype, name="embed_conv1")(x)
        feat = jax.nn.relu(_bn(train, self.dtype, "embed_bn1")(feat))
        _cap("embed1", feat)

        s = TorchConv(c, 3, 1, 1, use_bias=True, init_mode="kaiming_relu",
                      dtype=self.dtype, name="scale_conv1")(feat)
        s = jax.nn.relu(_bn(train, self.dtype, "scale_bn1")(s))
        s = TorchConv(c, 3, 1, 1, use_bias=True, init_mode="kaiming_relu",
                      dtype=self.dtype, name="scale_conv2")(s)
        s = jax.nn.relu(_bn(train, self.dtype, "scale_bn2")(s))
        s = TorchConv(1, 1, 1, 0, use_bias=True, init_mode="kaiming_relu",
                      dtype=self.dtype, name="scale_conv3")(s)
        scale = 2.0 * jax.nn.sigmoid(
            _bn(train, self.dtype, "scale_bn3", zero_init=True)(s))

        # enlarged 3x3 sampling grid around each pixel (align_corners=True);
        # target shape (B, h, 3(di), w, 3(dj), 2)
        grid = build_enlarged_grid(scale[..., 0])
        feat_enl = ops.grid_sample_bilinear(feat, grid, align_corners=True)

        feat = TorchConv(c, 3, 3, 0, use_bias=True, init_mode="kaiming_relu",
                         dtype=self.dtype, name="embed_conv2")(feat_enl)
        feat = jax.nn.relu(_bn(train, self.dtype, "embed_bn2")(feat))
        _cap("embed2", feat)

        # 3 fusion iterations: shared convs, per-iteration BNs
        fusion1 = TorchConv(c, 3, 1, 1, use_bias=True,
                            init_mode="kaiming_relu", dtype=self.dtype,
                            name="fusion_conv1")
        fusion2 = TorchConv(c, 3, 1, 1, use_bias=True,
                            init_mode="kaiming_relu", dtype=self.dtype,
                            name="fusion_conv2")
        fusion3 = TorchConv(1, 1, 1, 0, use_bias=True,
                            init_mode="kaiming_relu", dtype=self.dtype,
                            name="fusion_conv3")
        out = jnp.full((b, h, w, 1), 0.5, dtype=feat.dtype)
        for it in (1, 2, 3):
            x = jnp.concatenate([feat, out], axis=-1)
            x = jax.nn.relu(_bn(train, self.dtype, f"fusion_bn1_iter{it}")(
                fusion1(x)))
            x = jax.nn.relu(_bn(train, self.dtype, f"fusion_bn2_iter{it}")(
                fusion2(x)))
            out = jax.nn.relu(_bn(train, self.dtype, f"fusion_bn3_iter{it}")(
                fusion3(x)))
        _cap("fusion", out)

        if self.phase_up and not train:
            from esmstereo_tpu.nn.phasefold import from_phases
            out4_ph = PhConfUpsample(c, dtype=self.dtype, name="conf_up4")(
                f1, out, train=train, capture=capture, tag="up4_")
            # 1-channel fine tensor: cheap relayout into conf_up1's coarse
            # section (cm stack at 1/4), like the disparity residual stream.
            out4 = from_phases(out4_ph, 4)
            _cap("out4", out4)
            out1_ph = PhConfUpsample(c, dtype=self.dtype, name="conf_up1")(
                f2, out4, train=train, capture=capture, tag="up1_")
            return jax.nn.sigmoid(from_phases(out1_ph, 4))
        out4 = ConfUpsample(c, dtype=self.dtype, name="conf_up4")(
            f1, out, train=train)
        _cap("out4", out4)
        out1 = ConfUpsample(c, dtype=self.dtype, name="conf_up1")(
            f2, out4, train=train)
        return jax.nn.sigmoid(out1)


class ESMStereoConfidence(nn.Module):
    """ESMStereo + confidence output (``ESMStereo_confidence.py:746-976``).

    Returns ``(disparity (B,H,W), confidence (B,H,W))``. Requires
    ``cv_scale=16`` + ``mobilenetv2_100`` like the reference.
    """

    config: ESMStereoConfig = ESMStereoConfig(
        cv_scale=16, backbone="mobilenetv2_100")

    @nn.compact
    def __call__(self, left: Array, right: Array, *, train: bool = False,
                 capture_internals: bool = False):
        cfg = self.config
        assert cfg.cv_scale == 16, (
            "the confidence head is only defined for cv_scale=16 "
            "(ESMStereo_confidence.py:868-871)")
        backbone = ESMStereo(config=cfg, name="stereo")
        disp, aux = backbone(left, right, train=train, train_status=False,
                             capture_internals=True)
        caps: dict | None = dict(aux) if capture_internals else None
        conf = LAFNetHead(16, phase_up=cfg.phase_fold_upsample,
                          dtype=cfg.dtype, name="confidence_net")(
            aux["cost"], aux["init_pred"], aux["match_left"],
            aux["f16"], aux["f4"], train=train, capture=caps)
        if capture_internals:
            caps["disp"] = disp[0]
            return (disp[0], conf[..., 0]), caps
        return disp[0], conf[..., 0]
