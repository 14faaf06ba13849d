"""TPU numeric check: fused Pallas fast paths vs the plain XLA paths.

Interpret-mode tests prove the kernels' math on CPU; this tool proves the
COMPILED kernels on the real chip: it builds one cv4 model, runs the same
params through (a) all fused paths on and (b) all off, and reports the
max |delta| of the full-res disparity. Run at deployment numerics with
--dtype bfloat16 --fast_gelu.

Usage: python tools/tpu_numeric_check.py [--height 128 --width 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fast_gelu", action="store_true")
    p.add_argument("--cpu", action="store_true")
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

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    if args.fast_gelu:
        from esmstereo_tpu.nn.blocks import set_gelu_approximate
        set_gelu_approximate(True)

    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    cfg_on = ESMStereoConfig(cv_scale=4, backbone="efficientnet_b2",
                             dtype=dt)
    cfg_off = dataclasses.replace(
        cfg_on, fuse_backbone_head=False, fuse_agg_stem=False,
        fuse_mixer=False, pallas_volume=False)

    rng = np.random.default_rng(0)
    left = jax.device_put(np.asarray(
        rng.standard_normal((1, args.height, args.width, 3)), np.float32))
    right = jax.device_put(np.asarray(
        rng.standard_normal((1, args.height, args.width, 3)), np.float32))

    m_on = ESMStereo(config=cfg_on)
    m_off = ESMStereo(config=cfg_off)
    v = jax.jit(lambda l, r: m_off.init(
        jax.random.key(0), l, r, train=False))(left, right)

    d_off = np.asarray(jax.jit(
        lambda vv, l, r: m_off.apply(vv, l, r, train=False)[0])(
        v, left, right), np.float32)
    d_on = np.asarray(jax.jit(
        lambda vv, l, r: m_on.apply(vv, l, r, train=False)[0])(
        v, left, right), np.float32)

    diff = np.abs(d_on - d_off)
    # the top-2 bin selection is discontinuous: tiny numeric deltas can
    # flip the selected bin at near-flat cost pixels (same effect the
    # torch parity tests see) — report flips separately
    flips = diff > 1.0
    print(json.dumps({
        "max_abs": float(diff.max()),
        "mean_abs": float(diff.mean()),
        "flip_frac": float(flips.mean()),
        "mean_abs_no_flips": float(diff[~flips].mean()) if (~flips).any()
        else 0.0,
        "dtype": args.dtype, "fast_gelu": bool(args.fast_gelu),
    }))


if __name__ == "__main__":
    main()
