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
    # Same for the up levels (deconv + concat + k1 + k3); independent so
    # the two kernel families A/B separately.
    fuse_up: bool = False
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
            from esmstereo_tpu.attic import fused_hourglass as _fhg

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

        def up_level_plain(src, skip, ci_u, co_, d_s_, d2_, hw, names):
            n_up, n_cat, n_c3 = names
            up = block(co_, ci_u, d_s_, 4, 2, 1, n_up, deconv=True)(
                src, train=train)
            up = _crop_folded(up, hw[0], hw[1], d2_, co_)
            # plain lane concat; the depth-interleave is folded into the
            # 1x1x1 conv's (block-diagonal) channel matrix — a runtime
            # lane-splitting reshape would cost a relayout copy per call
            cat = jnp.concatenate([up, skip], axis=-1)
            cat = block(co_, 2 * co_, d2_, 1, 1, 0, n_cat,
                        depth_block=None,
                        in_perm=interleave_indices(d2_, [co_, co_]))(
                cat, train=train)
            return block(co_, co_, d2_, 3, 1, 1, n_c3)(cat, train=train)

        def up_level(src, skip, ci_u, co_, d_s_, d2_, hw, names):
            h2_, w2_ = skip.shape[1], skip.shape[2]
            use_up = (self.fuse_up and not train
                      and not self.is_initializing() and _plmod.accel_ok())
            if not (use_up and h2_ % 2 == 0 and w2_ == 2 * src.shape[2]
                    and h2_ <= 2 * src.shape[1]):
                return up_level_plain(src, skip, ci_u, co_, d_s_, d2_,
                                      hw, names)
            from esmstereo_tpu.nn.blocks import GELU_APPROXIMATE
            from esmstereo_tpu.nn.folded3d import FoldedConvParams
            from esmstereo_tpu.attic import fused_hourglass as _fhg

            n_up, n_cat, n_c3 = names
            pu, su = FoldedConvParams((4, 4, 4, ci_u, co_), deconv=True,
                                      name=n_up)()
            pc, sc = FoldedConvParams((1, 1, 1, 2 * co_, co_),
                                      name=n_cat)()
            p3, s3 = FoldedConvParams((3, 3, 3, co_, co_), name=n_c3)()
            consts = _fhg.prepare_up_consts(
                pu["conv"]["kernel"], (pu["bn"], su["bn"]),
                pc["conv"]["Conv_0"]["kernel"], (pc["bn"], sc["bn"]),
                p3["conv"]["Conv_0"]["kernel"], (p3["bn"], s3["bn"]),
                depth_in=d_s_, depth_out=d2_,
                in_perm=interleave_indices(d2_, [co_, co_]),
                gelu_approximate=GELU_APPROXIMATE)
            dt = self.dtype or skip.dtype
            return _fhg.fused_up_pair_apply(
                src.astype(dt), skip.astype(dt), consts,
                interpret=_plmod.force_interpret())

        conv2 = up_level(conv3, conv2, c3, c2, d3, d2, (h2, w2),
                         ("conv3_up", "agg_0_0", "agg_0_1"))
        conv1 = up_level(conv2, conv1, c2, c1, d2, d1, (h1, w1),
                         ("conv2_up", "agg_1_0", "agg_1_1"))

        return block(1, c1, d1, 4, 2, 1, "conv1_up", deconv=True, bn=False,
                     act=None)(conv1, train=train)


