"""Interleaved A/B of the W-phase mixer on the attached TPU.

Builds the full L model twice with SHARED parameters — wphase_mixer off
(A) vs on (B) — and alternates chained-scan measurements A,B,A,B,A,B in
one session (session-to-session spread on the tunneled chip is ~5-10%,
so only interleaved same-session numbers are comparable; see BASELINE.md
and the fuse_volume_agg A/B precedent).

Usage: python tools/wphase_ab.py [--dtype bfloat16] [--fast_gelu]
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
    p.add_argument("--fast_gelu", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="tanh-approx GELU (default on; --no-fast_gelu for "
                        "an exact-erf A/B)")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--const_weights", action="store_true",
                   help="serving mode: close the params over the jit "
                        "(see perf_report.py --const_weights)")
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

    base = dict(cv_scale=4, backbone="efficientnet_b2", dtype=dt)
    models = {
        "plain": ESMStereo(config=ESMStereoConfig(**base)),
        "wphase": ESMStereo(config=ESMStereoConfig(wphase_mixer=True,
                                                   **base)),
    }
    variables = jax.jit(
        lambda l, r: models["plain"].init(jax.random.key(0), l, r,
                                          train=False))(left, right)

    fns = {}
    for name, model in models.items():
        def apply_fn(v, l, r, _m=model):
            return _m.apply(v, l, r, train=False)[0]
        fns[name] = apply_fn

    for rnd in range(args.rounds):
        for name in ("plain", "wphase"):
            if args.const_weights:
                from tools.stage_profile import chained_time_ms
                fn = fns[name]
                ms = chained_time_ms(
                    lambda l, r, _f=fn: _f(variables, l, r),
                    (left, right), reps=args.reps)
            else:
                ms = chained_scan_time_ms(fns[name], variables, left, right,
                                          reps=args.reps)
            print(json.dumps({"round": rnd, "config": name,
                              "weights": ("const" if args.const_weights
                                          else "args"),
                              "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
