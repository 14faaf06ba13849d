"""Interleaved A/B of a boolean ESMStereoConfig flag on the attached TPU.

Builds the full model twice with SHARED parameters — ``--flag`` off (A)
vs on (B) — and alternates chained-scan measurements A,B,A,B in one
session (session-to-session spread on the tunneled chip is ~5-10%; only
interleaved same-session numbers are comparable — BASELINE.md harness
note). Also prints the disparity deviation between the two paths (the
accuracy cost, e.g. of the int8 volume; exact fast paths show ~0).

Usage: python tools/config_ab.py --flag volume_int8|fuse_hourglass|...
       [--variant L|M] [--dtype bfloat16] [--no-fast_gelu]
       [--const_weights]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "L": dict(cv_scale=4, backbone="efficientnet_b2"),
    "M": dict(cv_scale=8, backbone="efficientnet_b2"),
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--flag", default="volume_int8",
                   help="boolean ESMStereoConfig field to A/B")
    p.add_argument("--variant", default="L", choices=sorted(VARIANTS))
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fast_gelu", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--const_weights", action="store_true")
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

    import jax.numpy as jnp
    import numpy as np

    if args.fast_gelu:
        from esmstereo_tpu.nn.blocks import set_gelu_approximate
        set_gelu_approximate(True)

    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
    from esmstereo_tpu.utils.profiling import chained_scan_time_ms

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    rng = np.random.default_rng(0)
    shape = (1, args.height, args.width, 3)
    left = jax.device_put(np.asarray(rng.standard_normal(shape), np.float32))
    right = jax.device_put(np.asarray(rng.standard_normal(shape), np.float32))

    base = dict(dtype=dt, **VARIANTS[args.variant])
    assert hasattr(ESMStereoConfig(), args.flag), args.flag
    models = {
        "off": ESMStereo(config=ESMStereoConfig(**base)),
        "on": ESMStereo(config=ESMStereoConfig(**{args.flag: True}, **base)),
    }
    variables = jax.jit(
        lambda l, r: models["off"].init(jax.random.key(0), l, r,
                                        train=False))(left, right)

    fns = {}
    for name, model in models.items():
        def apply_fn(v, l, r, _m=model):
            return _m.apply(v, l, r, train=False)[0]
        fns[name] = apply_fn

    # accuracy cost of the flag on this input (0 for exact fast paths)
    d_f = np.asarray(jax.jit(fns["off"])(variables, left, right))
    d_q = np.asarray(jax.jit(fns["on"])(variables, left, right))
    diff = np.abs(d_f - d_q)
    print(json.dumps({"flag": args.flag,
                      "disp_dev_q95": float(np.quantile(diff, 0.95)),
                      "disp_dev_max": float(diff.max())}), flush=True)

    for rnd in range(args.rounds):
        for name in ("off", "on"):
            if args.const_weights:
                from tools.stage_profile import chained_time_ms
                fn = fns[name]
                ms = chained_time_ms(
                    lambda l, r, _f=fn: _f(variables, l, r),
                    (left, right), reps=args.reps)
            else:
                ms = chained_scan_time_ms(fns[name], variables, left, right,
                                          reps=args.reps)
            print(json.dumps({"round": rnd, "config": f"{args.flag}={name}",
                              "weights": ("const" if args.const_weights
                                          else "args"),
                              "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
