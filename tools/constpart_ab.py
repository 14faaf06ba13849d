"""Which constants buy the consts-mode speedup? Partitioned A/B.

The round-3 harness note measured weights-as-args 1.1-3.3 ms slower than
weights-as-constants per variant, and round-5's AUTO-entry-layout A/B
(tools/layout_ab.py) proved entry-layout relayout contributes ~nothing.
This tool bisects the remaining candidates by closing over PARTS of the
variable tree while keeping the rest as runtime arguments:

  * ``args``    — everything a runtime argument (bench.py headline)
  * ``bn``      — batch_stats + BN/LN scale/bias closed over as
                  constants; conv/dense kernels stay arguments. If this
                  arm recovers most of the consts win, the lever is
                  eval-time BN folding (a param-tree transform any
                  serving runtime can apply), not weight baking.
  * ``consts``  — everything closed over (serving mode)

Usage: python tools/constpart_ab.py [--variants S] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "L": dict(cv_scale=4, backbone="efficientnet_b2", cost_volume="gwc"),
    "M": dict(cv_scale=8, backbone="efficientnet_b2", cost_volume="gwc"),
    "S": dict(cv_scale=16, backbone="mobilenetv2_100",
              cost_volume="norm_correlation"),
}

# parameter-leaf names that belong to normalization layers (flax naming:
# BatchNorm {scale,bias,mean,var}; our LayerNorms use {scale,bias} under
# modules named *norm*/ln*; conv/dense kernels are 'kernel'/'bias')
_BN_MODULES = ("bn", "norm", "ln1", "ln2")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--variants", default="S")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
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

    import jax.numpy as jnp
    import numpy as np

    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
    from esmstereo_tpu.nn.blocks import set_gelu_approximate

    set_gelu_approximate(True)

    def path_is_bn(path) -> bool:
        keys = [getattr(k, "key", "") for k in path]
        # any module segment that is a normalization layer
        return any(
            any(str(k).startswith(m) for m in _BN_MODULES) for k in keys)

    def chained(model, n):
        def fn(v, l, r):
            def body(carry, _):
                li, ri = carry
                d = model.apply(v, li, ri, train=False)[0]
                eps = (d * 1e-30)[..., None].astype(li.dtype)
                return (li + eps, ri + eps), ()

            (lf, _), _ = jax.lax.scan(body, (l, r), None, length=n)
            return lf[0, 0, 0]

        return fn

    rng = np.random.default_rng(0)
    left = np.asarray(rng.standard_normal((1, args.height, args.width, 3)),
                      np.float32)
    right = np.asarray(rng.standard_normal((1, args.height, args.width, 3)),
                       np.float32)

    out = {}
    for name in [v.strip() for v in args.variants.split(",") if v.strip()]:
        cfg = ESMStereoConfig(
            **VARIANTS[name],
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)
        model = ESMStereo(config=cfg)
        ld, rd = jax.device_put(left), jax.device_put(right)
        variables = jax.jit(
            lambda l, r: model.init(jax.random.key(0), l, r, train=False)
        )(ld, rd)

        # split params into (bn-ish, rest); batch_stats always join the
        # constant side in the 'bn' arm
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        n_bn = sum(1 for pth, _ in flat if path_is_bn(pth))
        print(f"[{name}] {n_bn}/{len(flat)} param leaves classed as "
              "norm-layer", flush=True)

        def merge_apply(n):
            base = chained(model, n)

            def fn(kernels, l, r):
                merged = jax.tree_util.tree_map_with_path(
                    lambda pth, const_leaf, arg_leaf: (
                        const_leaf if path_is_bn(pth) else arg_leaf),
                    variables["params"], kernels)
                return base({"params": merged,
                             "batch_stats": variables["batch_stats"]},
                            l, r)

            return fn

        fns = {}
        fns["args"] = [jax.jit(chained(model, n)) for n in
                       (args.reps + 1, 1)]
        fns["bn_const"] = [jax.jit(merge_apply(n)) for n in
                           (args.reps + 1, 1)]
        fns["consts"] = [jax.jit(
            lambda l, r, _n=n: chained(model, _n)(variables, l, r))
            for n in (args.reps + 1, 1)]

        calls = {
            "args": (lambda: np.asarray(fns["args"][0](variables, ld, rd)),
                     lambda: np.asarray(fns["args"][1](variables, ld, rd))),
            "bn_const": (
                lambda: np.asarray(
                    fns["bn_const"][0](variables["params"], ld, rd)),
                lambda: np.asarray(
                    fns["bn_const"][1](variables["params"], ld, rd))),
            "consts": (lambda: np.asarray(fns["consts"][0](ld, rd)),
                       lambda: np.asarray(fns["consts"][1](ld, rd))),
        }
        for long_c, short_c in calls.values():
            long_c(), short_c()
        per = {k: [] for k in calls}
        for _ in range(args.rounds):
            for k, (long_c, short_c) in calls.items():
                t0 = time.perf_counter()
                long_c()
                t_long = time.perf_counter() - t0
                t0 = time.perf_counter()
                short_c()
                t_short = time.perf_counter() - t0
                per[k].append((t_long - t_short) / args.reps * 1e3)
        out[name] = {k: {"ms": [round(v, 3) for v in vs],
                         "best_ms": round(min(vs), 3)}
                     for k, vs in per.items()}
        print(name, json.dumps(out[name]), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
