"""Depth-folded 3-D aggregation hourglass (the TPU fast path).

Same computation and parameter tree as ``models.esmstereo.Aggregation3D``
(reference semantics ``ESMStereo.py:129-182``) but on the folded
``(B, H, W, D*C)`` layout, where every 3-D conv becomes a dense 2-D conv
with a block-banded channel matrix (see ``nn.folded3d`` for why this is
~10x faster on TPU). Verified numerically equivalent in
``tests/test_folded_model.py``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

import jax.numpy as jnp

from esmstereo_tpu.nn.folded3d import FoldedConvBlock3D
from esmstereo_tpu.nn.phasefold import interleave_indices

Array = jax.Array


def _crop_folded(x: Array, h: int, w: int, d: int, channels: int) -> Array:
    """Crop deconv overhang: spatial on dims 1-2, depth via channel blocks
    (channels are laid out d-major: ``d * C + c``)."""
    x = x[:, :h, :w]
    if x.shape[-1] != d * channels:
        x = x[..., : d * channels]
    return x


class FoldedAggregation3D(nn.Module):
    """Three-level hourglass on the folded volume.

    Input ``(B, H, W, D * in_channels)``; output ``(B, H*2, W*2, D*2)``
    (single true channel — the folded channels ARE the disparity bins,
    which is exactly the disparity-last layout regression wants).
    """

    in_channels: int
    add_channel: int
    depth: int
    # Run each down-level (stride-2, stride-1) conv pair as ONE Pallas
    # kernel (ops.pallas.fused_hourglass) on accelerator backends in eval
    # mode — the stem-kernel re-read fix applied to the hourglass's
    # biggest convs. Param-tree compatible with the plain path.
    fuse_pairs: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        cin, add, d0 = self.in_channels, self.add_channel, self.depth

        def block(feat, cin_, d_, k, s, p, name, deconv=False, bn=True,
                  act="gelu", **kw):
            # depth_block=8 beats the FoldedConvBlock3D default of 16 for
            # the hourglass's channel widths (out blocks 8*24/8*40 lanes
            # still fill the MXU, and the narrower band halves the
            # structural-zero MACs): 1.55 -> 1.15 ms at 544x960 L bf16 on
            # v5e (tools/agg_experiments.py).
            kw.setdefault("depth_block", 8)
            return FoldedConvBlock3D(
                feat, cin_, d_, k, s, p, deconv=deconv, bn=bn, act=act,
                dtype=self.dtype, name=name, **kw)

        c1, c2, c3 = cin + add, cin + add * 2, cin + add * 4
        d1 = (d0 + 1) // 2
        d2 = (d1 + 1) // 2
        d3 = (d2 + 1) // 2

        from esmstereo_tpu.ops import pallas as _plmod
        use_fp = (self.fuse_pairs and not train
                  and not self.is_initializing() and _plmod.accel_ok()
                  and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if use_fp:
            from esmstereo_tpu.nn.blocks import GELU_APPROXIMATE
            from esmstereo_tpu.nn.folded3d import FoldedConvParams
            from esmstereo_tpu.ops.pallas import fused_hourglass as _fhg

            def down_pair(feat, cin_, co_, d_, n0, n1):
                p0, s0 = FoldedConvParams((3, 3, 3, cin_, co_), name=n0)()
                p1, s1 = FoldedConvParams((3, 3, 3, co_, co_), name=n1)()
                consts = _fhg.prepare_pair_consts(
                    p0["conv"]["Conv_0"]["kernel"], (p0["bn"], s0["bn"]),
                    p1["conv"]["Conv_0"]["kernel"], (p1["bn"], s1["bn"]),
                    depth=d_, gelu_approximate=GELU_APPROXIMATE)
                dt = self.dtype or feat.dtype
                return _fhg.fused_down_pair_apply(
                    feat.astype(dt), consts,
                    interpret=_plmod.force_interpret())

            conv1 = down_pair(x, cin, c1, d0, "conv1_0", "conv1_1")
            h1, w1 = conv1.shape[1], conv1.shape[2]
            if conv1.shape[1] % 2 == 0 and conv1.shape[2] % 2 == 0:
                conv2 = down_pair(conv1, c1, c2, d1, "conv2_0", "conv2_1")
            else:
                conv2 = block(c2, c1, d1, 3, 2, 1, "conv2_0")(
                    conv1, train=train)
                conv2 = block(c2, c2, d2, 3, 1, 1, "conv2_1")(
                    conv2, train=train)
            h2, w2 = conv2.shape[1], conv2.shape[2]
            if conv2.shape[1] % 2 == 0 and conv2.shape[2] % 2 == 0:
                conv3 = down_pair(conv2, c2, c3, d2, "conv3_0", "conv3_1")
            else:
                conv3 = block(c3, c2, d2, 3, 2, 1, "conv3_0")(
                    conv2, train=train)
                conv3 = block(c3, c3, d3, 3, 1, 1, "conv3_1")(
                    conv3, train=train)
        else:
            conv1 = block(c1, cin, d0, 3, 2, 1, "conv1_0")(x, train=train)
            h1, w1 = conv1.shape[1], conv1.shape[2]
            conv1 = block(c1, c1, d1, 3, 1, 1, "conv1_1")(conv1, train=train)

            conv2 = block(c2, c1, d1, 3, 2, 1, "conv2_0")(conv1, train=train)
            h2, w2 = conv2.shape[1], conv2.shape[2]
            conv2 = block(c2, c2, d2, 3, 1, 1, "conv2_1")(conv2, train=train)

            conv3 = block(c3, c2, d2, 3, 2, 1, "conv3_0")(conv2, train=train)
            conv3 = block(c3, c3, d3, 3, 1, 1, "conv3_1")(conv3, train=train)

        up3 = block(c2, c3, d3, 4, 2, 1, "conv3_up", deconv=True)(
            conv3, train=train)
        up3 = _crop_folded(up3, h2, w2, d2, c2)
        # plain lane concat; the depth-interleave is folded into the
        # 1x1x1 conv's (block-diagonal) channel matrix — a runtime
        # lane-splitting reshape would cost a relayout copy per call
        conv2 = jnp.concatenate([up3, conv2], axis=-1)
        conv2 = block(c2, 2 * c2, d2, 1, 1, 0, "agg_0_0", depth_block=None,
                      in_perm=interleave_indices(d2, [c2, c2]))(
            conv2, train=train)
        conv2 = block(c2, c2, d2, 3, 1, 1, "agg_0_1")(conv2, train=train)

        up2 = block(c1, c2, d2, 4, 2, 1, "conv2_up", deconv=True)(
            conv2, train=train)
        up2 = _crop_folded(up2, h1, w1, d1, c1)
        conv1 = jnp.concatenate([up2, conv1], axis=-1)
        conv1 = block(c1, 2 * c1, d1, 1, 1, 0, "agg_1_0", depth_block=None,
                      in_perm=interleave_indices(d1, [c1, c1]))(
            conv1, train=train)
        conv1 = block(c1, c1, d1, 3, 1, 1, "agg_1_1")(conv1, train=train)

        return block(1, c1, d1, 4, 2, 1, "conv1_up", deconv=True, bn=False,
                     act=None)(conv1, train=train)


