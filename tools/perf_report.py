"""Per-variant latency report on the attached TPU (or CPU with --cpu).

TPU-native counterpart of the reference's ``--performance`` harness
(``/root/reference/train_sceneflow.py:254-275``) generalized over model
variants and compute dtypes. Uses the chained-scan methodology (see
``esmstereo_tpu.utils.profiling.chained_scan_time_ms`` and BASELINE.md):
per-call wall timing on a tunneled TPU measures dispatch, not device time.

Example:
    python tools/perf_report.py --variants L,L_bf16,M_bf16,S_bf16 --height 544 --width 960
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
    "S": dict(cv_scale=16, backbone="mobilenetv2_100"),
    # confidence variant (S config + LAFNet head); both outputs are
    # consumed in the timing chain
    "C": dict(cv_scale=16, backbone="mobilenetv2_100",
              cost_volume="norm_correlation"),
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variants", default="L,L_bf16",
                   help="comma list; suffix _bf16 for bfloat16 compute")
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fast_gelu", action="store_true",
                   help="deployment-precision tanh GELU (see bench.py)")
    p.add_argument("--const_weights", action="store_true",
                   help="close the parameters over the jit (compile-time "
                        "constants) instead of passing them as arguments — "
                        "the serving configuration (a baked engine, like "
                        "the reference's TensorRT deployments). Measured "
                        "1.7x faster on the overhead-bound S variant "
                        "(BASELINE.md round-3 harness note)")
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

    rng = np.random.default_rng(0)
    shape = (args.batch, args.height, args.width, 3)
    left = jax.device_put(np.asarray(rng.standard_normal(shape), np.float32))
    right = jax.device_put(np.asarray(rng.standard_normal(shape), np.float32))

    for spec in args.variants.split(","):
        spec = spec.strip()
        name, _, suffix = spec.partition("_")
        dtype = jnp.bfloat16 if suffix == "bf16" else None
        cfg = ESMStereoConfig(dtype=dtype, **VARIANTS[name])
        if name == "C":
            from esmstereo_tpu.models.confidence import ESMStereoConfidence
            model = ESMStereoConfidence(config=cfg)
        else:
            model = ESMStereo(config=cfg)
        variables = jax.jit(
            lambda l, r: model.init(jax.random.key(0), l, r, train=False)
        )(left, right)

        if name == "C":
            def apply_fn(v, l, r):
                d, conf = model.apply(v, l, r, train=False)
                return d + conf
        else:
            def apply_fn(v, l, r):
                return model.apply(v, l, r, train=False)[0]

        if args.const_weights:
            from tools.stage_profile import chained_time_ms
            ms = chained_time_ms(lambda l, r: apply_fn(variables, l, r),
                                 (left, right), reps=args.reps)
        else:
            ms = chained_scan_time_ms(apply_fn, variables, left, right,
                                      reps=args.reps)
        print(json.dumps({
            "variant": spec,
            "weights": "const" if args.const_weights else "args",
            "shape": f"{args.batch}x{args.height}x{args.width}",
            "ms_per_frame": round(ms, 2),
            "fps_per_chip": round(1e3 / ms * args.batch, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
