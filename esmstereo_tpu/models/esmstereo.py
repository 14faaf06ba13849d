"""ESMStereo disparity network (TPU-native Flax, NHWC/NDHWC).

Re-implements the reference architecture (``/root/reference/models/
ESMStereo.py``) from its computation graph up: siamese feature pyramid →
multi-scale fusion (FeatUp) → matching descriptors → cost volume →
3-D hourglass aggregation → initial disparity regression → ESM
(ShuffleMixer + refinement) upsampling.

Variant map (cv_scale selects the cost-volume resolution; paper L/M/S):

  * ``cv_scale=4``  (L): /4 volume, 48 bins, top-2 regression, 2-stage x2
    upsampler. Backbones: efficientnet_b2 or mobilenetv2_100.
  * ``cv_scale=8``  (M): /8 volume, 24 bins, raw-cost regression, 3-stage x2
    upsampler. Backbone: efficientnet_b2 (channel plumbing requires it,
    ``ESMStereo.py:590,671``).
  * ``cv_scale=16`` (S): /16 volume, 12 bins, semantic attention over the
    volume, 2-stage x4 upsampler. Backbone: mobilenetv2_100
    (``ESMStereo.py:594,691``).

All disparity outputs are multiplied by 4 (the net regresses quarter-pixel
units, ``ESMStereo.py:735-745``). Train mode returns the multi-scale list;
eval returns ``[disp_full]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from esmstereo_tpu import ops
from esmstereo_tpu.backbones import ARCHS, FeaturePyramid
from esmstereo_tpu.nn.blocks import Conv2x, ConvBlock, StemBlock, TorchConv
from esmstereo_tpu.nn.shufflemixer import FMBlock, PixelShuffleUp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ESMStereoConfig:
    max_disp: int = 192
    cost_volume: str = "gwc"          # 'gwc' | 'norm_correlation'
    backbone: str = "efficientnet_b2"
    cv_scale: int = 4                 # 4 | 8 | 16
    num_groups: int = 32
    reduction: int = 8
    # Fold the disparity axis into the channel/lane dimension for the
    # whole cost-volume + 3-D aggregation pipeline (nn.folded3d). XLA's
    # TPU lowering of the small-channel NDHWC 3-D convs runs at ~1% of
    # the MXU; the folded block-banded 2-D formulation measures ~10x
    # faster per op on v5e. Numerically equivalent, parameter-compatible.
    fold_depth: bool = True
    # Execute the ESM upsampler's sub-grid-resolution stages in phase
    # space on the cost-volume base grid (models.phased_upsample; eval
    # mode; all cv scales). Exact for eval; train mode always uses the
    # reference layout. Measured on v5e at 544x960 (L): 29.7 -> 24.3 ms.
    phase_fold_upsample: bool = True
    # Run the siamese towers (backbone, FeatUp, stems, descriptors) on the
    # concatenated [left; right] batch instead of two separate passes:
    # halves the number of small-conv dispatches. Eval-mode numerics are
    # identical; train-mode BatchNorm then uses joint (left+right) batch
    # statistics where the reference normalises each eye with its own
    # per-call stats — a tiny, arguably beneficial deviation (the running
    # averages converge to the same values).
    siamese_batch: bool = True
    # Execute the backbone's sub-1/4-resolution stages and the stem_2/
    # stem_4 stacks in phase space on the 1/4 base grid
    # (backbones.phased). Exact and param-compatible, but OFF by default:
    # measured on v5e at 544x960 L the full model runs 23.0 ms plain vs
    # 27.0 ms phased — densifying the depthwise kernels onto the MXU
    # costs Cx the MACs (mid=96 blocks dominate) and boundary relayouts
    # eat the stems' 0.5 ms win. Kept as a tested experiment; eval mode
    # with siamese_batch and /4-divisible inputs only (falls back
    # otherwise).
    phase_fold_towers: bool = False
    # Execute the backbone stem + stage 0 with the fused Pallas kernel
    # (ops.pallas.fused_head) on accelerator backends in eval mode:
    # the plain XLA lowering of the small-channel half-res section is
    # ~2.9 GB of HBM traffic; measured 3.7 -> 1.1 ms at 544x960 batch-2
    # siamese on v5e. Param tree unchanged (backbones.fused twins
    # FeaturePyramid); falls back for training, CPU, or inputs not
    # divisible by (16, 32).
    fuse_backbone_head: bool = True
    # Execute the stem_2 + stem_4 matching towers as one Pallas kernel
    # (ops.pallas.fused_stems). OFF by default: measured 2.82 ms fused vs
    # 2.12 ms plain at 544x960 on v5e — the stems are dense 3x3 convs and
    # the kernel's block-diagonal matmuls pay a 4-8x structural MAC waste
    # that XLA's native convs do not (contrast with fuse_backbone_head,
    # where the depthwise section's MXU was idle). Kept as a tested
    # opt-in; remaining stems (cv8/cv16) stay plain on top of the fused
    # stem_4 output.
    fuse_stems: bool = False
    # Use the Pallas materializing correlation kernel in the UNFOLDED
    # path instead of the jnp shift-slice formulation (the folded path
    # has its own volume builder). Opt-in: XLA fuses the jnp volume into
    # the consumer without materializing it.
    use_pallas: bool = False
    # Build the FOLDED cost volume with the one-pass Pallas kernel
    # (ops.pallas.correlation_volume_folded) when running on an
    # accelerator backend in eval mode: 0.33 ms vs 3.9 ms for the jnp
    # shift-slice formulation at 544x960 L on v5e (XLA materializes a
    # layout copy of the features per disparity shift). Exact
    # (HIGHEST-precision group mean). The jnp path is kept for CPU,
    # training (pallas_call has no reverse-mode AD rule), and
    # spatially-sharded pjit (set this False there — a Pallas call
    # cannot be partitioned over the H grid by XLA).
    pallas_volume: bool = True
    # Execute group_stem + agg (the two banded cost-volume entry convs)
    # as one Pallas kernel (ops.pallas.fused_agg_stem) on accelerator
    # backends in eval mode: XLA's conv emitter re-reads operands per
    # K-tile at their 5-14k-wide contractions (2.8 ms vs ~0.5 ms at
    # 544x960 L bf16). Param-tree compatible; falls back for training,
    # CPU, cv16 norm-correlation (attention multiply sits between the
    # convs), and under spatial sharding.
    fuse_agg_stem: bool = True
    # Build the folded cost volume INSIDE the stem+agg kernel (requires
    # fuse_agg_stem + pallas_volume; cv4/cv8), so the ~100 MB volume is
    # never materialized in HBM. BITWISE identical to the staged pair
    # (the in-kernel build mirrors the correlation kernel's math
    # including its bf16 storage round trip) but OFF by default: measured
    # 14.72 ms fused vs 13.73 ms staged at 544x960 L bf16 (interleaved
    # A/B x3, 2026-08-21) — the in-tile volume rebuild serializes behind
    # the convs and pays 2x product MACs for the 128-lane channel pad,
    # losing more than the saved volume write+read (~0.25 ms). Kept as
    # tested groundwork like fuse_stems.
    fuse_volume_agg: bool = False
    # EXPERIMENT (round 4, the int8 descriptor/volume traffic lever named
    # in round 1): store the folded cost volume in HBM as int8 between
    # the correlation kernel and the stem+agg kernel. Per-frame symmetric
    # scale from the volume's own max; the dequant rides for free in the
    # stem conv weights (prepare_consts input_scale). Requires
    # fuse_agg_stem + the staged (not fuse_volume_agg) path; eval only.
    # Saves half the volume's HBM bytes (~50 MB at 544x960 L bf16
    # ≈ 0.06 ms at roofline) at the cost of an extra max+quantize pass.
    # MEASURED (round 4, interleaved A/B x3, L bf16): LOSES ~0.25 ms
    # (13.89-13.94 off vs 14.11-14.24 on) with disparity deviation q95
    # 0.0011 px — the quantize pass outweighs the read saving, closing
    # the round-1 int8 lever. Kept opt-in with bounded-accuracy tests
    # (tests/test_fused_agg_stem.py::test_int8_volume_accuracy).
    volume_int8: bool = False
    # TRIED-AND-LOST (round 4, attic/fused_hourglass.py): each
    # hourglass down-level (s2, s1) pair / up level (deconv+cat+k1+k3)
    # as one Pallas kernel. Exact, but the interleaved A/B on L bf16
    # LOSES: plain 13.74-13.90 ms, down fused +0.65, down+up +1.4 —
    # post-depth_block-tuning the hourglass convs are not re-read-bound
    # like the stem was. Permanently off; kept for the record.
    fuse_hourglass: bool = False
    fuse_hourglass_up: bool = False
    # RETIRED fast path (kept for interpret-mode parity coverage only,
    # like fused_stage): the cv4 upsampler's to_feat + FMBlock x2 +
    # shuffle-up as one Pallas kernel (attic/fused_mixer.py). The
    # section's plain lowering wastes ~1.3 ms/frame at 12% lane
    # utilization, and the kernel is numerically exact — but its Mosaic
    # compile takes 2643 s (44 min) at 544x960 even after the roll-FMA ->
    # banded-matmul rewrite cut the op count ~4x (measured 2026-08-21). Row-tiling cannot rescue it: the grid body compiles
    # once, so per-op vreg count shrinks only linearly with tile rows
    # while the +-15-row halo of the 6 chained spatial stages makes
    # recompute waste ~(tile+30)/tile — no tile size gets compile under
    # budget without ~2x compute. Do NOT enable on hardware.
    fuse_mixer: bool = False
    # TRIED-AND-LOST fast path (kept as tested groundwork, like
    # fused_stage / fuse_volume_agg): the same mixer section in W-phase
    # lanes at the XLA level (attic/wphase.py) — 8 width-phases folded into
    # 128 lanes, every op a block-structured conv/matmul, the depthwise
    # 7x7 densified onto the MXU. Exact up to float reassociation, but
    # interleaved A/B on L bf16 544x960 measured a ~0.2-0.4 ms LOSS in
    # BOTH harness modes (args: 13.89 plain vs 14.15 wphase; const
    # weights: 12.78 vs 13.03, tools/wphase_ab.py 2026-08-21): the extra
    # block matmuls + fp32 LN passes cost more than the 16-lane
    # underfill they avoid. Do not enable by default.
    wphase_mixer: bool = False
    # Round-5: execute the Pallas fast-path kernels UNDER a spatial
    # (H-sharded) mesh via jax.shard_map (parallel.shard_kernels) — each
    # device runs the single-chip kernel on its H-slab, with the conv
    # halos exchanged over the mesh and global-coordinate boundary
    # masking. Set by ``parallel.mesh.spatial_safe_config(...,
    # shard_kernels=True)``; ``None`` (default) = single-device dispatch.
    # Covers pallas_volume + fuse_agg_stem; the other kernels stay off
    # under spatial sharding.
    shard_mesh: Any = None
    dtype: Any = None

    def __post_init__(self):
        assert self.cost_volume in ("gwc", "norm_correlation"), self.cost_volume
        assert self.cv_scale in (4, 8, 16), self.cv_scale
        if self.cv_scale == 8 and self.backbone != "efficientnet_b2":
            raise ValueError(
                "cv_scale=8 requires efficientnet_b2 (descriptor conv is "
                "sized for its 96-ch /8 features, ESMStereo.py:590)")
        if self.cv_scale == 16 and self.backbone != "mobilenetv2_100":
            raise ValueError(
                "cv_scale=16 requires mobilenetv2_100 (semantic/descriptor "
                "convs are sized for its 96-ch /16 features, "
                "ESMStereo.py:594,606)")


def _mul_att_folded(volume: Array, att: Array, depth: int) -> Array:
    """Broadcast-multiply a (B,H,W,C) attention map over the folded
    (B,H,W,D*C) volume's depth blocks (``ESMStereo.py:703,711``). Tiling
    the attention map across the d-major lanes avoids splitting the lane
    dimension (a relayout copy on TPU)."""
    return volume * jnp.tile(att, (1, 1, 1, depth))


def _crop_like(x: Array, ref_arr: Array) -> Array:
    """Crop trailing spatial overhang after a deconv (``ESMStereo.py:172,177``)."""
    slices = tuple(slice(0, ref_arr.shape[i]) for i in range(x.ndim - 1))
    return x[slices + (slice(None),)]


class FeatUp(nn.Module):
    """Top-down multi-scale fusion of the siamese pyramids.

    Reference: ``ESMStereo.py:79-125``. Applied to left and right pyramids
    with shared weights; uses the reference's ``weight_init`` (msra) init.
    """

    chans: Sequence[int]
    cv_scale: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: list[Array], *, train: bool = False) -> list[Array]:
        x2, x4, x8, x16, x32 = feats
        c = self.chans
        v = self.cv_scale
        x16 = Conv2x(c[3], deconv=True, dtype=self.dtype,
                     name="deconv32_16")(x32, x16, train=train)
        if v == 16:
            x16 = ConvBlock(c[2] * 2, 3, 1, 1, init_mode="msra",
                            dtype=self.dtype, name="conv16")(x16, train=train)
        if v in (8, 4):
            x8 = Conv2x(c[2], deconv=True, dtype=self.dtype,
                        name="deconv16_8")(x16, x8, train=train)
        if v == 8:
            x8 = ConvBlock(c[2] * 2, 3, 1, 1, init_mode="msra",
                           dtype=self.dtype, name="conv8")(x8, train=train)
        if v == 4:
            x4 = Conv2x(c[1], deconv=True, dtype=self.dtype,
                        name="deconv8_4")(x8, x4, train=train)
            x4 = ConvBlock(c[1] * 2, 3, 1, 1, init_mode="msra",
                           dtype=self.dtype, name="conv4")(x4, train=train)
        return [x4, x8, x16, x32]


class Aggregation3D(nn.Module):
    """Three-level 3-D hourglass over the cost volume (NDHWC).

    Reference: ``ESMStereo.py:129-182``. Encoder strides 2 over (D, H, W)
    three times, decodes with skip fusions, and emits a single-channel
    volume via a final transposed conv.
    """

    in_channels: int
    add_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        cin, add = self.in_channels, self.add_channel

        def block(feat, k, s, p, name, deconv=False, bn=True, act="gelu"):
            return ConvBlock(feat, k, s, p, deconv=deconv, dims=3, bn=bn,
                             act=act, dtype=self.dtype, name=name)

        conv1 = block(cin + add, 3, 2, 1, "conv1_0")(x, train=train)
        conv1 = block(cin + add, 3, 1, 1, "conv1_1")(conv1, train=train)

        conv2 = block(cin + add * 2, 3, 2, 1, "conv2_0")(conv1, train=train)
        conv2 = block(cin + add * 2, 3, 1, 1, "conv2_1")(conv2, train=train)

        conv3 = block(cin + add * 4, 3, 2, 1, "conv3_0")(conv2, train=train)
        conv3 = block(cin + add * 4, 3, 1, 1, "conv3_1")(conv3, train=train)

        conv3_up = block(cin + add * 2, 4, 2, 1, "conv3_up",
                         deconv=True)(conv3, train=train)
        conv2 = jnp.concatenate([_crop_like(conv3_up, conv2), conv2], axis=-1)
        conv2 = block(cin + add * 2, 1, 1, 0, "agg_0_0")(conv2, train=train)
        conv2 = block(cin + add * 2, 3, 1, 1, "agg_0_1")(conv2, train=train)

        conv2_up = block(cin + add, 4, 2, 1, "conv2_up",
                         deconv=True)(conv2, train=train)
        conv1 = jnp.concatenate([_crop_like(conv2_up, conv1), conv1], axis=-1)
        conv1 = block(cin + add, 1, 1, 0, "agg_1_0")(conv1, train=train)
        conv1 = block(cin + add, 3, 1, 1, "agg_1_1")(conv1, train=train)

        return block(1, 4, 2, 1, "conv1_up", deconv=True, bn=False,
                     act=None)(conv1, train=train)


class UpRefinement(nn.Module):
    """2-D hourglass residual refinement of an upsampled disparity.

    Reference: ``ESMStereo.py:185-239``. ``f1`` joins at the /4 level of the
    hourglass (relative to the disparity input), ``f2`` at /2.
    """

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, disp: Array, f1: Array, f2: Array,
                 *, train: bool = False) -> Array:
        c = self.channels

        def block(feat, k, s, p, name, deconv=False, bn=True, act="gelu"):
            return ConvBlock(feat, k, s, p, deconv=deconv, bn=bn, act=act,
                             dtype=self.dtype, name=name)

        conv1 = block(c, 3, 2, 1, "conv1_0")(disp, train=train)
        conv1 = block(c, 3, 1, 1, "conv1_1")(conv1, train=train)
        conv2 = block(c, 3, 2, 1, "conv2_0")(conv1, train=train)
        conv2 = block(c, 3, 1, 1, "conv2_1")(conv2, train=train)
        conv3 = block(c, 3, 2, 1, "conv3_0")(conv2, train=train)
        conv3 = block(c, 3, 1, 1, "conv3_1")(conv3, train=train)

        conv3_up = block(c, 4, 2, 1, "conv3_up", deconv=True)(conv3, train=train)
        conv2 = jnp.concatenate([_crop_like(conv3_up, conv2), conv2, f1],
                                axis=-1)
        conv2 = block(c, 1, 1, 0, "agg_0_0")(conv2, train=train)
        conv2 = block(c, 3, 1, 1, "agg_0_1")(conv2, train=train)

        conv2_up = block(c, 4, 2, 1, "conv2_up", deconv=True)(conv2, train=train)
        conv1 = jnp.concatenate([conv2_up, conv1, f2], axis=-1)
        conv1 = block(c, 1, 1, 0, "agg_1_0")(conv1, train=train)
        conv1 = block(c, 3, 1, 1, "agg_1_1")(conv1, train=train)

        return block(1, 4, 2, 1, "conv1_up", deconv=True, bn=False,
                     act=None)(conv1, train=train)


class DispFeatures(nn.Module):
    """Disparity feature stack ``dm*`` (k5p1 → k3p1 → k3p1 → k1p1).

    Net spatial size is preserved (the k5/p1 shrink cancels the k1/p1 grow);
    reference: ``ESMStereo.py:250-253``.
    """

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, disp: Array, *, train: bool = False) -> Array:
        c = self.channels
        x = ConvBlock(c, 5, 1, 1, dtype=self.dtype, name="conv0")(disp, train=train)
        x = ConvBlock(c, 3, 1, 1, dtype=self.dtype, name="conv1")(x, train=train)
        x = ConvBlock(c, 3, 1, 1, dtype=self.dtype, name="conv2")(x, train=train)
        x = ConvBlock(c, 1, 1, 1, dtype=self.dtype, name="conv3")(x, train=train)
        return x


class SpxBlock(nn.Module):
    """``spx_*`` fusion: ConvBlock → conv3x3 → BN → GELU (``ESMStereo.py:255-258``)."""

    mid: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = ConvBlock(self.mid, 3, 1, 1, dtype=self.dtype,
                      name="conv0")(x, train=train)
        x = TorchConv(self.out, 3, 1, 1, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        from esmstereo_tpu.nn.blocks import apply_act
        return apply_act(x, "gelu")


class _UpStage(nn.Module):
    """One ESM upsampling stage: disp features → fuse → (mix) → shuffle-up →
    tail → hourglass refinement → bilinear-up + residual."""

    dm_ch: int
    spx_out: int
    n_feats: int
    shuffle: int            # pixel-shuffle factor
    bilinear: int           # bilinear upsample factor for the skip
    ref_ch: int
    use_mixer: bool         # to_feat + FMBlocks before the shuffle-up
    dtype: Any = None

    @nn.compact
    def __call__(self, disp: Array, fuse_feat: Array, ref_f1: Array,
                 ref_f2: Array, *, train: bool = False) -> Array:
        d = DispFeatures(self.dm_ch, dtype=self.dtype, name="dm")(disp, train=train)
        x = SpxBlock(self.dm_ch, self.spx_out, dtype=self.dtype, name="spx")(
            jnp.concatenate([d, fuse_feat], axis=-1), train=train)
        if self.use_mixer:
            x = TorchConv(self.n_feats, 3, 1, 1, dtype=self.dtype,
                          name="to_feat")(x)
            x = FMBlock(self.n_feats, 7, 2, dtype=self.dtype, name="block0")(x)
            x = FMBlock(self.n_feats, 7, 2, dtype=self.dtype, name="block1")(x)
        x = PixelShuffleUp(self.n_feats, self.shuffle, dtype=self.dtype,
                           name="up")(x)
        x = TorchConv(1, 3, 1, 1, use_bias=True, dtype=self.dtype,
                      name="tail")(x)
        x = UpRefinement(self.ref_ch, dtype=self.dtype, name="ref")(
            x, ref_f1, ref_f2, train=train)
        h, w = disp.shape[1] * self.bilinear, disp.shape[2] * self.bilinear
        return ops.resize_bilinear(disp, (h, w)) + x


class Upsample4(nn.Module):
    """x4 ESM upsampler (two x2 stages). Reference: ``ESMStereo.py:242-318``."""

    dtype: Any = None

    @nn.compact
    def __call__(self, f1x: Array, f2x: Array, f4x: Array, init_disp: Array,
                 *, train: bool = False) -> tuple[Array, Array]:
        up2 = _UpStage(32, 32, 16, 2, 2, 32, True, dtype=self.dtype,
                       name="stage2x")(init_disp, f2x, f1x, f2x, train=train)
        up4 = _UpStage(32, 16, 16, 2, 2, 32, False, dtype=self.dtype,
                       name="stage4x")(up2, f4x, f2x, f4x, train=train)
        return up4, up2


class Upsample8(nn.Module):
    """x8 ESM upsampler (three x2 stages). Reference: ``ESMStereo.py:320-428``."""

    dtype: Any = None

    @nn.compact
    def __call__(self, f2x: Array, f4x: Array, f8x: Array, stem2: Array,
                 init_disp: Array, *, train: bool = False):
        up2 = _UpStage(16, 16, 8, 2, 2, 16, True, dtype=self.dtype,
                       name="stage2x")(init_disp, f4x, f2x, f4x, train=train)
        up4 = _UpStage(16, 8, 8, 2, 2, 16, False, dtype=self.dtype,
                       name="stage4x")(up2, f8x, f4x, f8x, train=train)
        up8 = _UpStage(16, 8, 8, 2, 2, 16, False, dtype=self.dtype,
                       name="stage8x")(up4, stem2, f8x, stem2, train=train)
        return up8, up4, up2


class Upsample16(nn.Module):
    """x16 ESM upsampler (two x4 stages). Reference: ``ESMStereo.py:430-509``."""

    dtype: Any = None

    @nn.compact
    def __call__(self, f1x: Array, f2x: Array, f4x: Array, f8x: Array,
                 init_disp: Array, *, train: bool = False):
        up2 = _UpStage(16, 16, 8, 4, 4, 16, True, dtype=self.dtype,
                       name="stage2x")(init_disp, f2x, f2x, f1x, train=train)
        up4 = _UpStage(16, 8, 8, 4, 4, 16, False, dtype=self.dtype,
                       name="stage4x")(up2, f4x, f4x, f8x, train=train)
        return up4, up2


class ESMStereo(nn.Module):
    """Full ESMStereo network. Reference: ``ESMStereo.py:511-745``."""

    config: ESMStereoConfig = ESMStereoConfig()

    @nn.compact
    def __call__(self, left: Array, right: Array, *, train: bool = False,
                 train_status: bool | None = None,
                 capture_internals: bool = False):
        """Forward pass.

        With ``capture_internals=True`` also returns the intermediate
        tensors the confidence head consumes
        (``ESMStereo_confidence.py:972``).
        """
        cfg = self.config
        if train_status is None:
            train_status = train
        v = cfg.cv_scale
        chans = ARCHS[cfg.backbone].chans
        dtype = cfg.dtype

        phased_towers = (cfg.phase_fold_towers and not train
                         and cfg.siamese_batch
                         and left.shape[1] % 4 == 0
                         and left.shape[2] % 4 == 0)
        fused_head = (cfg.fuse_backbone_head and not train
                      and not phased_towers
                      and left.shape[1] % 16 == 0
                      and left.shape[2] % 32 == 0)
        if phased_towers:
            from esmstereo_tpu.backbones.phased import (PhasedFeaturePyramid,
                                                        PhasedStemBlock)
            feature = PhasedFeaturePyramid(arch=cfg.backbone, dtype=dtype,
                                           name="feature")
        elif fused_head:
            from esmstereo_tpu.backbones.fused import FusedHeadPyramid
            feature = FusedHeadPyramid(arch=cfg.backbone, dtype=dtype,
                                       name="feature")
        else:
            feature = FeaturePyramid(arch=cfg.backbone, dtype=dtype,
                                     name="feature")
        bsz = left.shape[0]
        if cfg.siamese_batch:
            both = jnp.concatenate([left, right], axis=0)
            f_both = feature(both, train=train)
            if v in (4, 8):
                feature_up = FeatUp(chans, v, dtype=dtype, name="feature_up")
                f_both = feature_up(f_both, train=train)
            fl = [f[:bsz] for f in f_both]
            fr = [f[bsz:] for f in f_both]
        else:
            fl = feature(left, train=train)
            fr = feature(right, train=train)
            # FeatUp consumes the full 5-level pyramid [x2..x32] and
            # returns [x4, x8, x16, x32]; for cv_scale=16 the raw
            # pyramid is used directly (ESMStereo.py:643-646).
            if v in (4, 8):
                feature_up = FeatUp(chans, v, dtype=dtype, name="feature_up")
                fl = feature_up(fl, train=train)
                fr = feature_up(fr, train=train)

        # --- stems + matching descriptors -------------------------------
        stem_chs = {4: (32, 48), 8: (32, 48, 64), 16: (16, 24, 32, 40)}[v]
        stems_l, stems_r = [], []
        if cfg.siamese_batch and phased_towers:
            from esmstereo_tpu.nn.phasefold import from_phases, to_phases
            x = to_phases(both, 4)
            p, cin = 4, both.shape[-1]
            for i, sc in enumerate(stem_chs):
                name = f"stem_{2 ** (i + 1)}"
                if p > 1:
                    x = PhasedStemBlock(sc, cin, p, dtype=dtype,
                                        name=name)(x, train=train)
                    p //= 2
                    fine = from_phases(x, p) if p > 1 else x
                else:
                    x = StemBlock(sc, dtype=dtype, name=name)(x, train=train)
                    fine = x
                cin = sc
                stems_l.append(fine[:bsz])
                stems_r.append(fine[bsz:])
        elif cfg.siamese_batch:
            from esmstereo_tpu.ops.pallas.fused_stems import stems_supported
            fused_stems = (cfg.fuse_stems and not train
                           and stems_supported(left.shape[1], left.shape[2],
                                               stem_chs[0], stem_chs[1]))
            if fused_stems:
                from esmstereo_tpu.backbones.fused import (StemBlockParams,
                                                           reference_stem_eval)
                from esmstereo_tpu.ops.pallas import fused_stems as _fst
                p2, s2st = StemBlockParams(stem_chs[0], both.shape[-1],
                                           name="stem_2")()
                p4, s4st = StemBlockParams(stem_chs[1], stem_chs[0],
                                           name="stem_4")()
                bf = jnp.asarray(both, jnp.float32)
                from esmstereo_tpu.ops import pallas as _plmod
                if (self.is_initializing()
                        or not _plmod.accel_ok()):
                    s2x = reference_stem_eval(bf, p2, s2st)
                    s4x = reference_stem_eval(s2x, p4, s4st)
                else:
                    consts = _fst.prepare_stems_consts(
                        {"stem_2": p2, "stem_4": p4},
                        {"stem_2": s2st, "stem_4": s4st},
                        w_img=both.shape[2], f2=stem_chs[0],
                        f4=stem_chs[1])
                    s2x, s4x = _fst.fused_stems_apply(
                        bf, consts, interpret=_plmod.force_interpret())
                out_dt = dtype or both.dtype
                x = s4x.astype(out_dt)
                for s in (s2x.astype(out_dt), x):
                    stems_l.append(s[:bsz])
                    stems_r.append(s[bsz:])
                for i, sc in enumerate(stem_chs[2:], start=2):
                    x = StemBlock(sc, dtype=dtype,
                                  name=f"stem_{2 ** (i + 1)}")(x, train=train)
                    stems_l.append(x[:bsz])
                    stems_r.append(x[bsz:])
            else:
                x = both
                for i, sc in enumerate(stem_chs):
                    x = StemBlock(sc, dtype=dtype,
                                  name=f"stem_{2 ** (i + 1)}")(x, train=train)
                    stems_l.append(x[:bsz])
                    stems_r.append(x[bsz:])
        else:
            x_l, x_r = left, right
            for i, sc in enumerate(stem_chs):
                stem = StemBlock(sc, dtype=dtype, name=f"stem_{2 ** (i + 1)}")
                x_l = stem(x_l, train=train)
                x_r = stem(x_r, train=train)
                stems_l.append(x_l)
                stems_r.append(x_r)

        feat_idx, stem_idx = {4: (0, 1), 8: (1, 2), 16: (3, 3)}[v]
        match_l_in = jnp.concatenate([fl[feat_idx], stems_l[stem_idx]],
                                     axis=-1)
        match_r_in = jnp.concatenate([fr[feat_idx], stems_r[stem_idx]],
                                     axis=-1)

        conv = ConvBlock(64, 3, 1, 1, dtype=dtype, name="conv")
        # The reference descriptor is a default nn.Conv2d, i.e. WITH bias
        # (ESMStereo.py:587 ``self.desc = nn.Conv2d(64, 64, ...)``); found
        # by the full-model transplant parity test.
        desc = TorchConv(64, 1, 1, 0, use_bias=True, dtype=dtype, name="desc")
        if cfg.siamese_batch:
            m_both = desc(conv(
                jnp.concatenate([match_l_in, match_r_in], axis=0),
                train=train))
            match_l, match_r = m_both[:bsz], m_both[bsz:]
        else:
            match_l = desc(conv(match_l_in, train=train))
            match_r = desc(conv(match_r_in, train=train))

        # --- cost volume + aggregation ----------------------------------
        num_bins = cfg.max_disp // v
        red = cfg.reduction
        add_channel = {4: 16, 8: 8, 16: 4}[v]
        if v == 16:
            sem_mid, sem_out = (64, 32) if cfg.cost_volume == "gwc" else (32, 8)
            att2d = ConvBlock(sem_mid, 3, 1, 1, dtype=dtype,
                              name="semantic_0")(fl[3], train=train)
            att2d = TorchConv(sem_out, 3, 1, 1, dtype=dtype,
                              name="semantic_1")(att2d)

        if cfg.fold_depth:
            from esmstereo_tpu.models.folded_agg import FoldedAggregation3D
            from esmstereo_tpu.nn.folded3d import FoldedConvBlock3D

            # The jnp shift-slice volume makes XLA materialize a re-laid-out
            # copy of the target features per disparity (~0.5 GB/frame at
            # 544x960 L, ~3.9 ms); the Pallas kernel builds the folded
            # volume in one pass (~0.33 ms). CPU (tests, fake meshes) and
            # train mode (no AD rule for pallas_call) keep the jnp path.
            from esmstereo_tpu.ops import pallas as _plmod
            use_pk = (cfg.pallas_volume and not train
                      and _plmod.accel_ok())
            # Fused stem+agg kernel: XLA's lowering of these two banded
            # convs re-reads operands per K-tile at their ~5-14k-wide
            # contractions (2.4 + 0.4 ms at 544x960 L bf16 vs a ~0.5 ms
            # roofline; tools/agg_experiments.py). Only when the two convs
            # are adjacent (the cv16 norm-correlation attention multiply
            # sits between them) and off the CPU/train/sharded paths.
            use_fas = (cfg.fuse_agg_stem and not train
                       and not self.is_initializing()
                       and _plmod.accel_ok())
            if cfg.cost_volume == "norm_correlation":
                stem_name, stem_ci = "corr_stem", 1
                use_fas = use_fas and v != 16
            else:
                stem_name, stem_ci = "group_stem", cfg.num_groups
            # Full fusion: build the volume INSIDE the stem+agg kernel —
            # the (H/v, W/v, D*G) volume (~100 MB bf16 at 544x960 L) is
            # never materialized in HBM. cv16 keeps the staged path (its
            # attention multiply sits between volume and stem).
            fuse_vol = (cfg.fuse_volume_agg and use_fas and use_pk
                        and v != 16)

            def _corr_folded(groups, normalize=False):
                """Pallas volume build — shard_map'd per H-slab when a
                spatial mesh is configured (parallel.shard_kernels)."""
                if cfg.shard_mesh is not None:
                    from esmstereo_tpu.parallel import shard_kernels as _sk
                    return _sk.sharded_correlation_volume_folded(
                        match_l, match_r, num_bins, groups,
                        cfg.shard_mesh, normalize=normalize,
                        interpret=_plmod.force_interpret())
                from esmstereo_tpu.ops.pallas import correlation as _pk
                return _pk.correlation_volume_folded(
                    match_l, match_r, num_bins, groups,
                    normalize=normalize,
                    interpret=_plmod.force_interpret())

            if not fuse_vol:
                if cfg.cost_volume == "norm_correlation":
                    if use_pk:
                        volume = _corr_folded(1, normalize=True)
                    else:
                        volume = ops.build_norm_correlation_volume_folded(
                            match_l, match_r, num_bins)
                else:
                    if use_pk:
                        volume = _corr_folded(cfg.num_groups)
                    else:
                        volume = ops.build_gwc_volume_folded(
                            match_l, match_r, num_bins, cfg.num_groups)
                    if v == 16:
                        volume = _mul_att_folded(volume, att2d, num_bins)

            if use_fas:
                from esmstereo_tpu.nn.blocks import GELU_APPROXIMATE
                from esmstereo_tpu.nn.folded3d import FoldedConvParams
                from esmstereo_tpu.ops.pallas import fused_agg_stem as _fas
                p1, s1 = FoldedConvParams((3, 3, 3, stem_ci, red),
                                          name=stem_name)()
                p2, s2 = FoldedConvParams((3, 3, 3, red, red), name="agg")()
                use_i8 = cfg.volume_int8 and not fuse_vol
                in_scale = None
                if use_i8:
                    # symmetric PER-BATCH quantization (one max over the
                    # whole volume): a shared scalar scale is required for
                    # the dequant to fold into the stem conv weights
                    # (linear). At the deployment batch of 1 this equals a
                    # per-frame scale; for batch>1 an outlier frame costs
                    # the others resolution — acceptable for this measured
                    # -negative, default-off path.
                    vf = volume.astype(jnp.float32)
                    vmax = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-12)
                    volume = jnp.clip(jnp.round(vf * (127.0 / vmax)),
                                      -127.0, 127.0).astype(jnp.int8)
                    in_scale = vmax / 127.0
                consts = _fas.prepare_consts(
                    p1["conv"]["Conv_0"]["kernel"], (p1["bn"], s1["bn"]),
                    p2["conv"]["Conv_0"]["kernel"], (p2["bn"], s2["bn"]),
                    depth=num_bins, gelu_approximate=GELU_APPROXIMATE,
                    input_scale=in_scale)
                if fuse_vol:
                    volume = _fas.folded_volume_stem_agg_apply(
                        match_l, match_r, consts, num_groups=stem_ci,
                        normalize=cfg.cost_volume == "norm_correlation",
                        out_dtype=dtype or match_l.dtype,
                        interpret=_plmod.force_interpret())
                else:
                    vin = (volume if use_i8
                           else volume.astype(dtype or volume.dtype))
                    odt = (dtype or jnp.float32) if use_i8 else None
                    if cfg.shard_mesh is not None:
                        from esmstereo_tpu.parallel import (
                            shard_kernels as _sk)
                        volume = _sk.sharded_folded_stem_agg(
                            vin, consts, cfg.shard_mesh, out_dtype=odt,
                            interpret=_plmod.force_interpret())
                    else:
                        volume = _fas.folded_stem_agg_apply(
                            vin, consts, out_dtype=odt,
                            interpret=_plmod.force_interpret())
            else:
                volume = FoldedConvBlock3D(red, stem_ci, num_bins, 3, 1, 1,
                                           dtype=dtype, name=stem_name)(
                    volume, train=train)
                if cfg.cost_volume == "norm_correlation" and v == 16:
                    volume = _mul_att_folded(volume, att2d, num_bins)
                volume = FoldedConvBlock3D(red, red, num_bins, 3, 1, 1,
                                           dtype=dtype, name="agg")(
                    volume, train=train)
            cost_folded = FoldedAggregation3D(
                red, add_channel, num_bins, dtype=dtype,
                fuse_pairs=cfg.fuse_hourglass,
                fuse_up=cfg.fuse_hourglass_up,
                name="aggregation_out")(volume, train=train)
            cost = jnp.moveaxis(cost_folded, -1, 1)  # (B, D, H/v, W/v)
        else:
            att = att2d[:, None] if v == 16 else None  # NDHWC broadcast
            if cfg.cost_volume == "norm_correlation":
                volume = self._corr_volume(match_l, match_r, num_bins, 1)
                volume = ConvBlock(red, 3, 1, 1, dims=3, dtype=dtype,
                                   name="corr_stem")(volume, train=train)
                if v == 16:
                    volume = volume * att
            else:
                volume = self._corr_volume(match_l, match_r, num_bins,
                                           cfg.num_groups)
                if v == 16:
                    volume = volume * att
                volume = ConvBlock(red, 3, 1, 1, dims=3, dtype=dtype,
                                   name="group_stem")(volume, train=train)

            volume = ConvBlock(red, 3, 1, 1, dims=3, dtype=dtype,
                               name="agg")(volume, train=train)
            cost = Aggregation3D(red, add_channel, dtype=dtype,
                                 name="aggregation_out")(volume, train=train)
            cost = cost[..., 0]  # (B, D, H/v, W/v)

        # --- initial disparity + ESM upsampling -------------------------
        # Regression and the downstream disparity residual stream run in
        # fp32 regardless of the compute dtype: the disparity expectation
        # sums bin indices up to D, where bf16's 8-bit mantissa would
        # quantize sub-pixel estimates to ~0.25 px. The 1-channel stream
        # is cheap; features feeding it stay in cfg.dtype.
        cost = cost.astype(jnp.float32)
        phased = cfg.phase_fold_upsample and not train
        if v == 4:
            init_pred = ops.regression_topk(cost, None, 2)
            if phased:
                from esmstereo_tpu.models.phased_upsample import PhUpsample4
                ups = PhUpsample4(dtype=dtype, fuse_mixer=cfg.fuse_mixer,
                                  wphase_mixer=cfg.wphase_mixer,
                                  name="upsample_module")
            else:
                ups = Upsample4(dtype=dtype, name="upsample_module")
            disp_1, disp_2 = ups(
                fl[1], fl[0], stems_l[0], init_pred, train=train)
            outs = [disp_1, disp_2]
        elif v == 8:
            init_pred = ops.disparity_regression(cost, num_bins)
            if phased:
                from esmstereo_tpu.models.phased_upsample import PhUpsample8
                ups_cls = PhUpsample8
            else:
                ups_cls = Upsample8
            disp_1, disp_2, disp_4 = ups_cls(dtype=dtype,
                                             name="upsample_module")(
                fl[2], fl[1], fl[0], stems_l[0], init_pred, train=train)
            outs = [disp_1, disp_2, disp_4]
        else:
            init_pred = ops.disparity_regression(cost, num_bins)
            f2 = ConvBlock(32, 3, 1, 1, dtype=dtype, name="conv_f2")(
                fl[3], train=train)
            f0 = ConvBlock(24, 3, 1, 1, dtype=dtype, name="conv_f0")(
                fl[0], train=train)
            if phased:
                from esmstereo_tpu.models.phased_upsample import PhUpsample16
                ups_cls = PhUpsample16
            else:
                ups_cls = Upsample16
            disp_1, disp_2 = ups_cls(dtype=dtype, name="upsample_module")(
                fl[2], f2, fl[1], f0, init_pred, train=train)
            outs = [disp_1, disp_2]

        if train_status:
            result = [o[..., 0] * 4 for o in outs]
        else:
            result = [outs[0][..., 0] * 4]
        if capture_internals:
            aux = {
                "cost": cost,
                "init_pred": init_pred,
                "match_left": match_l,
                "f16": fl[3],
                "f4": fl[1],
                # intermediate-scale disparity (1/2 for cv4/cv16, 1/2 of
                # the 3-scale list for cv8): lets stage_profile split the
                # upsampler into its stages (anchoring here dead-code-
                # eliminates the final stage)
                "disp_2": outs[1][..., 0],
            }
            return result, aux
        return result

    def _corr_volume(self, match_l: Array, match_r: Array, num_bins: int,
                     groups: int) -> Array:
        cfg = self.config
        from esmstereo_tpu.ops import pallas as _plmod
        if cfg.use_pallas and _plmod.accel_ok():
            from esmstereo_tpu.ops.pallas import correlation as pk
            return pk.correlation_volume(
                match_l, match_r, num_bins, groups,
                normalize=cfg.cost_volume == "norm_correlation",
                interpret=_plmod.force_interpret())
        if cfg.cost_volume == "norm_correlation":
            return ops.build_norm_correlation_volume(match_l, match_r, num_bins)
        return ops.build_gwc_volume(match_l, match_r, num_bins, groups)
