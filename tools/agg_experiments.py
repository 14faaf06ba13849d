"""Dissect the folded 3-D aggregation hourglass on TPU.

The stage profile says agg3d is one of the three big stages left
(~4.8 ms fp32 / ~3 ms bf16 at 544x960 L), but its logical MAC and HBM
traffic estimates put light speed far below that. This tool times
isolated variants of the hourglass on the real volume shape to find
where the milliseconds actually go:

  * baseline        — FoldedAggregation3D as the model runs it
  * no_act          — GELU removed (transcendental / VPU cost)
  * no_bn           — BatchNorm removed (eval-mode FMA epilogue cost)
  * depth_block=N   — band tiling granularity (structural-MAC waste vs
                      lane width trade)
  * per-op          — each hourglass conv alone (layout/boundary costs)

Methodology: chained-scan timing (see utils.profiling) — per-call wall
timing on a tunneled TPU measures dispatch rate, not device time.

Usage: python tools/agg_experiments.py [--dtype bfloat16] [--fast_gelu]
       [--only baseline,no_act,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fast_gelu", action="store_true", default=True)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--only", default="",
                   help="comma-separated subset of experiment names")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import flax.linen as fnn
    import jax.numpy as jnp
    import numpy as np

    if args.fast_gelu:
        from esmstereo_tpu.nn.blocks import set_gelu_approximate
        set_gelu_approximate(True)

    from esmstereo_tpu.models.folded_agg import FoldedAggregation3D
    from esmstereo_tpu.nn.folded3d import FoldedConvBlock3D
    from tools.stage_profile import chained_time_ms

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    h4, w4 = args.height // 4, args.width // 4
    red, add, d0 = 8, 16, 48
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    vol = jax.device_put(np.asarray(
        rng.standard_normal((1, h4, w4, d0 * red)), np.float32))

    only = set(args.only.split(",")) if args.only else None

    def run(name, module, x, **kw):
        if only is not None and name not in only:
            return
        variables = jax.jit(lambda a: module.init(key, a, **kw))(x)

        def fn(a):
            return module.apply(variables, a, **kw)

        ms = chained_time_ms(fn, (x,), reps=args.reps)
        print(json.dumps({"exp": name, "ms": round(ms, 3)}), flush=True)

    class AggVariant(fnn.Module):
        act: str | None = "gelu"
        bn: bool = True
        depth_block: int | None = 16

        @fnn.compact
        def __call__(self, x, *, train=False):
            cin, add_, _ = red, add, d0

            def block(feat, cin_, d_, k, s, pd, name, deconv=False,
                      bn=None, act="x", **kw):
                return FoldedConvBlock3D(
                    feat, cin_, d_, k, s, pd, deconv=deconv,
                    bn=self.bn if bn is None else bn,
                    act=self.act if act == "x" else act,
                    depth_block=kw.pop("depth_block", self.depth_block),
                    dtype=dtype, name=name, **kw)

            from esmstereo_tpu.nn.phasefold import interleave_indices
            c1, c2, c3 = cin + add_, cin + add_ * 2, cin + add_ * 4
            d1, d2, d3 = (d0 + 1) // 2, (d0 + 3) // 4, (d0 + 7) // 8
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
            up3 = up3[:, :h2, :w2][..., : d2 * c2]
            conv2 = jnp.concatenate([up3, conv2], axis=-1)
            conv2 = block(c2, 2 * c2, d2, 1, 1, 0, "agg_0_0",
                          depth_block=None,
                          in_perm=interleave_indices(d2, [c2, c2]))(
                conv2, train=train)
            conv2 = block(c2, c2, d2, 3, 1, 1, "agg_0_1")(conv2, train=train)
            up2 = block(c1, c2, d2, 4, 2, 1, "conv2_up", deconv=True)(
                conv2, train=train)
            up2 = up2[:, :h1, :w1][..., : d1 * c1]
            conv1 = jnp.concatenate([up2, conv1], axis=-1)
            conv1 = block(c1, 2 * c1, d1, 1, 1, 0, "agg_1_0",
                          depth_block=None,
                          in_perm=interleave_indices(d1, [c1, c1]))(
                conv1, train=train)
            conv1 = block(c1, c1, d1, 3, 1, 1, "agg_1_1")(conv1, train=train)
            return block(1, c1, d1, 4, 2, 1, "conv1_up", deconv=True,
                         bn=False, act=None)(conv1, train=train)

    run("baseline", FoldedAggregation3D(red, add, d0, dtype=dtype), vol,
        train=False)
    run("no_act", AggVariant(act=None), vol, train=False)
    run("no_bn", AggVariant(bn=False), vol, train=False)
    run("dblock_none", AggVariant(depth_block=None), vol, train=False)
    run("dblock_8", AggVariant(depth_block=8), vol, train=False)
    run("dblock_24", AggVariant(depth_block=24), vol, train=False)

    # --- the full agg3d stage (group_stem + agg + hourglass), as the
    # model runs it on the raw (D*G)-lane volume --------------------------
    groups = 32
    raw_vol = jax.device_put(np.asarray(
        rng.standard_normal((1, h4, w4, d0 * groups)), np.float32))

    class FullStage(fnn.Module):
        depth_block: int | None = 16
        gs_block: int | None = 16

        @fnn.compact
        def __call__(self, v, *, train=False):
            v = FoldedConvBlock3D(red, groups, d0, 3, 1, 1,
                                  depth_block=self.gs_block, dtype=dtype,
                                  name="group_stem")(v, train=train)
            v = FoldedConvBlock3D(red, red, d0, 3, 1, 1,
                                  depth_block=self.depth_block, dtype=dtype,
                                  name="agg")(v, train=train)
            return FoldedAggregation3D(red, add, d0, dtype=dtype,
                                       name="aggregation_out")(v, train=train)

    run("full_stage", FullStage(), raw_vol, train=False)
    run("op_group_stem",
        FoldedConvBlock3D(red, groups, d0, 3, 1, 1, dtype=dtype), raw_vol,
        train=False)
    run("op_group_stem_db8",
        FoldedConvBlock3D(red, groups, d0, 3, 1, 1, depth_block=8,
                          dtype=dtype), raw_vol, train=False)
    run("op_group_stem_db48",
        FoldedConvBlock3D(red, groups, d0, 3, 1, 1, depth_block=None,
                          dtype=dtype), raw_vol, train=False)
    run("op_agg",
        FoldedConvBlock3D(red, red, d0, 3, 1, 1, dtype=dtype), vol,
        train=False)

    # single ops
    c1 = red + add
    d1 = (d0 + 1) // 2
    run("op_conv1_0",
        FoldedConvBlock3D(c1, red, d0, 3, 2, 1, dtype=dtype), vol,
        train=False)
    conv1_shape = (1, (h4 + 1) // 2, (w4 + 1) // 2, d1 * c1)
    conv1_in = jax.device_put(np.asarray(
        rng.standard_normal(conv1_shape), np.float32))
    run("op_conv1_1",
        FoldedConvBlock3D(c1, c1, d1, 3, 1, 1, dtype=dtype), conv1_in,
        train=False)
    run("op_conv1_up",
        FoldedConvBlock3D(1, c1, d1, 4, 2, 1, deconv=True, bn=False,
                          act=None, dtype=dtype), conv1_in, train=False)

    # MXU upper bound: one dense matmul with the same MAC count as
    # conv1_1's blocked band (the largest single contraction)
    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    m = conv1_shape[1] * conv1_shape[2]
    kdim = 9 * 18 * c1  # taps * in-depth-span * channels for one 16-block
    a = jax.device_put(np.asarray(
        rng.standard_normal((m, kdim)), np.float32))
    w = jax.device_put(np.asarray(
        rng.standard_normal((kdim, 16 * c1)), np.float32))
    if only is None or "matmul_bound" in only:
        ms = chained_time_ms(mm, (a, w), reps=args.reps)
        print(json.dumps({"exp": "matmul_bound", "ms": round(ms, 3),
                          "gmac": round(m * kdim * 16 * c1 / 1e9, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
