"""Retired groundwork — measured negative results, kept for the record.

Nothing in here is on any default code path. Each module is a working,
tested implementation that LOST its interleaved A/B on the attached TPU
(or proved uncompilable within budget) and was retired per the
measurements recorded in BASELINE.md ("Pallas fusion results"):

- ``fused_mixer``  — the cv4 upsampler's to_feat + FMBlock x2 +
  shuffle-up as one Pallas kernel. Exact (interpret-mode tests), ~4x
  op-count cut, but Mosaic compile measured 2643 s (44 min) at 544x960
  and row-tiling cannot fix it (halo reach ~15 rows vs per-program
  compile). tests/test_fused_mixer.py pins it in interpret mode.
- ``fused_stage``  — SE inverted-residual backbone stages as flat-lane
  Pallas kernels (the fused_head recipe applied to stages 1+). Exact,
  but 5x SLOWER than plain XLA (7.5 vs 1.5 ms on effb2 stage1): those
  stages are VPU-work-bound and the SE phase structure recomputes the
  6x-expanded mid tensors. tests/test_fused_stage.py.
- ``fused_hourglass`` — the aggregation hourglass's down (s2+s1) and up
  (deconv+concat+k1+k3) level pairs as per-level Pallas kernels
  (round 4). Exact, but the interleaved A/B on L bf16 LOSES (+0.65 ms
  down-only, +1.4 both): post-depth_block-tuning the hourglass convs
  are not K-tile-re-read-bound like the cost-volume stem was.
  tests/test_fused_hourglass.py.
- ``wphase``       — the same mixer section executed in W-phase lanes at
  the XLA level (8 width-phases folded into 128 lanes, every op a
  block-structured matmul). Exact, but loses 0.2-0.4 ms on L bf16 in
  interleaved A/B under BOTH harness modes (tools/wphase_ab.py).
  tests/test_shufflemixer_fastpaths.py.

The opt-in config flags (``fuse_mixer``, ``wphase_mixer``,
``fuse_hourglass``, ``fuse_hourglass_up``) still work —
model dispatch lazily imports from here — so the A/B tools keep running;
they are permanently off by default.
"""
