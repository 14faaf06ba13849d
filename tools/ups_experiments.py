"""Dissect the phased ESM upsampler (cv4 / L) on TPU.

Times each sub-block of PhUpStage2x / PhUpStage4x separately on
model-shaped inputs to locate where the upsampler's milliseconds go
(the stage is many 16-48 channel convs on the 1/4 base grid — per-op
overhead and lane underfill are the suspects, same pathology the fused
backbone head fixed).

Usage: python tools/ups_experiments.py [--dtype bfloat16] [--fast_gelu]
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
    p.add_argument("--only", default="")
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

    from esmstereo_tpu.models.esmstereo import DispFeatures, SpxBlock
    from esmstereo_tpu.models.phased_upsample import (
        PhConv,
        PhDispFeatures,
        PhPixelShuffleUp,
        PhSpx,
        PhUpRefinement,
        PhUpStage2x,
        PhUpStage4x,
    )
    from esmstereo_tpu.nn.blocks import TorchConv
    from esmstereo_tpu.nn.shufflemixer import FMBlock
    from tools.stage_profile import chained_time_ms

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    h4, w4 = args.height // 4, args.width // 4
    key = jax.random.key(0)
    rng = np.random.default_rng(0)

    def randn(*shape):
        return jax.device_put(
            np.asarray(rng.standard_normal(shape), np.float32))

    # Real model shapes at 544x960 L (see ESMStereo.__call__ ->
    # upsample_module(f_l[1], f_l[0], stem_2x, init_pred)):
    #   f1x = x8  (1/8, 2*chans[2] = 96c), joins refinement conv2
    #   f2x = x4  (1/4, 2*chans[1] = 48c)
    #   f4x = stem_2 (1/2, 32c, plain layout)
    init_disp = randn(1, h4, w4, 1)
    f1x = randn(1, h4 // 2, w4 // 2, 96)
    f2x = randn(1, h4, w4, 48)
    f4x = randn(1, h4 * 2, w4 * 2, 32)

    only = set(args.only.split(",")) if args.only else None

    def run(name, module, *inputs, **kw):
        if only is not None and name not in only:
            return None
        variables = jax.jit(lambda *a: module.init(key, *a, **kw))(*inputs)

        def fn(first, *rest):
            return module.apply(variables, first, *rest, **kw)

        ms = chained_time_ms(fn, inputs, reps=args.reps)
        print(json.dumps({"exp": name, "ms": round(ms, 3)}), flush=True)
        return jax.jit(fn)(*inputs)

    up2 = run("stage2x_full", PhUpStage2x(dtype=dt), f1x, f2x, init_disp,
              train=False)
    if up2 is None:
        up2 = jnp.zeros((1, h4, w4, 4), jnp.float32)
    run("stage4x_full", PhUpStage4x(dtype=dt), up2, f2x, f4x, train=False)

    # stage2x interior pieces
    run("dm_plain", DispFeatures(32, dtype=dt, name="dm"), init_disp,
        train=False)
    d_feat = randn(1, h4, w4, 32)
    spx_in = jnp.concatenate([d_feat, f2x], axis=-1)
    run("spx_plain", SpxBlock(32, 32, dtype=dt, name="spx"), spx_in,
        train=False)
    x16 = randn(1, h4, w4, 16)
    run("fmblock", FMBlock(16, 7, 2, dtype=dt, name="b0"), x16)
    run("to_feat", TorchConv(16, 3, 1, 1, dtype=dt, name="tf"),
        randn(1, h4, w4, 32))
    run("pixelshuffle_p1", PhPixelShuffleUp(16, 16, 1, dtype=dt, name="up"),
        x16)
    xp2 = randn(1, h4, w4, 16 * 4)
    run("tail_p2", PhConv(1, 16, 3, 1, 2, 2, use_bias=True, flat=True,
                          dtype=dt, name="tail"), xp2)
    disp_p2 = randn(1, h4, w4, 4)
    run("refinement_p2",
        PhUpRefinement(32, 2, 1, 1, 96, 48, dtype=dt, name="ref"),
        disp_p2, f1x, f2x, train=False)

    # stage4x interior pieces
    run("dm_p2", PhDispFeatures(32, 2, dtype=dt, name="dm4"), disp_p2,
        train=False)
    fused = randn(1, h4, w4, (32 + 32) * 4)
    run("spx_p2", PhSpx(32, 16, 32 + 32, 2, dtype=dt, name="spx4"), fused,
        train=False)
    disp_p4 = randn(1, h4, w4, 16)
    f4x_ph = randn(1, h4, w4, 32 * 4)
    run("refinement_p4",
        PhUpRefinement(32, 4, 1, 2, 48, 32, dtype=dt, name="ref4"),
        disp_p4, f2x, f4x_ph, train=False)


if __name__ == "__main__":
    main()
