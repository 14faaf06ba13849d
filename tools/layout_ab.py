"""Interleaved A/B: args-mode jit vs AUTO-entry-layout args-mode.

The round-3 harness note (BASELINE.md) measured weights-as-ARGUMENTS
1.1-3.3 ms slower than weights-closed-over-as-CONSTANTS per variant.
Part of that gap is relayout work: with runtime arguments, XLA picks
default (descending major-to-minor) entry layouts for every parameter
and relayouts them inside the program on EVERY execution, while
constants are laid out once at compile time.

``jax.experimental.layout`` removes exactly that term while keeping the
parameters as real runtime arguments (still updatable, training-style
dispatch): compile with ``in_shardings=Format(Layout.AUTO)``, read the
executable's chosen entry formats, and ``jax.device_put`` the parameter
tree into those layouts ONCE at load time — the TPU counterpart of a
serving runtime pre-packing weights into the engine's native layout
(the reference's TensorRT `.plan` does this at build time,
``kitti_publisher_cuda_node.cpp:177-209``).

Interleaves plain / auto-layout / (optionally) consts-mode timings of
the bench.py chained-scan harness in ONE session, several rounds, and
prints a JSON summary.

Usage: python tools/layout_ab.py [--variants L,S] [--rounds 3]
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


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--variants", default="L,S")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--consts", action="store_true",
                   help="also interleave the consts-mode row")
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
    from jax.experimental.layout import Format, Layout

    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
    from esmstereo_tpu.nn.blocks import set_gelu_approximate

    set_gelu_approximate(True)

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

        # plain args-mode (bench.py harness)
        fn_n = jax.jit(chained(model, args.reps + 1))
        fn_1 = jax.jit(chained(model, 1))

        # AUTO-entry-layout args-mode: compile with auto formats, put the
        # params into each executable's preferred layout once.
        t0 = time.time()
        auto = Format(Layout.AUTO)
        comp_n = jax.jit(chained(model, args.reps + 1),
                         in_shardings=auto).lower(
                             variables, ld, rd).compile()
        comp_1 = jax.jit(chained(model, 1), in_shardings=auto).lower(
            variables, ld, rd).compile()

        def put_args(comp):
            fmts, _ = comp.input_formats
            flat_f, _ = jax.tree.flatten(fmts)
            flat_a, tree = jax.tree.flatten((variables, ld, rd))
            put = [jax.device_put(a, f) for a, f in zip(flat_a, flat_f)]
            return jax.tree.unflatten(tree, put)

        put_n = put_args(comp_n)
        put_1 = put_args(comp_1)
        compile_s = time.time() - t0

        if args.consts:
            cn = jax.jit(lambda l, r: chained(model, args.reps + 1)(
                variables, l, r))
            c1 = jax.jit(lambda l, r: chained(model, 1)(variables, l, r))

        # per arm: (long_call, short_call); per-frame = (t_long-t_short)/reps
        calls = {"args": (lambda: np.asarray(fn_n(variables, ld, rd)),
                          lambda: np.asarray(fn_1(variables, ld, rd))),
                 "auto_layout": (lambda: np.asarray(comp_n(*put_n)),
                                 lambda: np.asarray(comp_1(*put_1)))}
        if args.consts:
            calls["consts"] = (lambda: np.asarray(cn(ld, rd)),
                               lambda: np.asarray(c1(ld, rd)))
        for long_c, short_c in calls.values():
            long_c(), short_c()  # compile + warm every arm before timing
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

        out[name] = {
            k: {"ms": [round(v, 3) for v in vs],
                "best_ms": round(min(vs), 3)} for k, vs in per.items()}
        out[name]["auto_compile_s"] = round(compile_s, 1)
        print(name, json.dumps(out[name]), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
