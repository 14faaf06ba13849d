"""Benchmark: frames/s/chip for the flagship ESMStereo-L forward pass.

Counterpart of the reference's latency harness
(``train_sceneflow.py:254-275``) at the driver's 960x540 target (padded to
960x544 for /32 divisibility, as every reference eval path pads to /32).

Precision: bfloat16 compute (params float32, regression boundary and
disparity residual stream float32) — the TPU counterpart of the
reference's fp16 TensorRT deployment engines
(``virtual_kitti_publisher/launch/...launch.py:17`` loads
``StereoModel_576_960_fp16.plan``; accuracy deviation is bounded in
tests/test_bf16.py). Set BENCH_DTYPE=float32 for the fp32 number.

Methodology note (important on remotely-attached TPUs): N forward passes
are chained *inside one jit* via ``lax.scan`` with a data dependency
between iterations, and completion is anchored by a device-to-host
transfer. ``block_until_ready`` alone does not reliably block on tunneled
PJRT platforms, and per-call timing would measure dispatch rate, not
device time. Per-frame time = (t(N) - t(1)) / (N - 1), which also cancels
the host round-trip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio against BENCH_BASELINE.json if present
(self-relative; the reference publishes no numbers — see BASELINE.md),
else 1.0, and the first run records itself as the baseline.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

H, W = 544, 960
N = int(os.environ.get("BENCH_REPS", "20")) + 1
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
# Deployment precision also approximates GELU (tanh form), mirroring how
# fp16 TensorRT engines evaluate transcendentals with reduced-precision
# polynomials; the full-model deviation this introduces is bounded in
# tests/test_bf16.py::test_fast_gelu_close_to_exact. Set BENCH_FAST_GELU=0
# for exact-erf numerics.
FAST_GELU = os.environ.get("BENCH_FAST_GELU", "1") == "1"
# BENCH_CONST_WEIGHTS=1 closes the parameters over the jit (compile-time
# constants) instead of passing them as arguments — the serving
# configuration (a baked engine, like the reference's TensorRT plans).
# Interleaved A/B measured this 1.7x faster on the overhead-bound S
# variant and ~10% on L (BASELINE.md round-3 harness note). Default OFF:
# the recorded baselines were measured with weights-as-args, and
# vs_baseline must stay like-for-like (the metric name carries a
# _constw suffix when enabled, giving it its own baseline row).
CONST_WEIGHTS = os.environ.get("BENCH_CONST_WEIGHTS", "0") == "1"
# BENCH_AUTO_LAYOUT=1 compiles with AUTO entry layouts and device_puts
# the parameters into the executable's preferred layout once at load
# time (jax.experimental.layout). The weights stay true runtime
# arguments — this only removes the per-execution relayout of
# default-layout parameters, the same pre-packing any serving runtime
# (incl. the reference's TensorRT engine build) performs on weights.
# Numerics are bitwise identical to the plain args path.
AUTO_LAYOUT = os.environ.get("BENCH_AUTO_LAYOUT", "0") == "1"


def _chained_time(model, variables, left, right, n: int) -> float:
    import jax

    def fn(v, l, r):
        def body(carry, _):
            li, ri = carry
            d = model.apply(v, li, ri, train=False)[0]
            # perturb BOTH eyes so no subgraph is loop-invariant (see
            # utils.profiling.chained_scan_time_ms)
            eps = (d * 1e-30)[..., None].astype(li.dtype)
            return (li + eps, ri + eps), ()

        (lf, _), _ = jax.lax.scan(body, (l, r), None, length=n)
        return lf[0, 0, 0]

    if CONST_WEIGHTS:
        f = jax.jit(lambda l, r: fn(variables, l, r))
        call = lambda: np.asarray(f(left, right))
    elif AUTO_LAYOUT:
        from jax.experimental.layout import Format, Layout

        comp = jax.jit(fn, in_shardings=Format(Layout.AUTO)).lower(
            variables, left, right).compile()
        fmts, _ = comp.input_formats
        flat_f, _ = jax.tree.flatten(fmts)
        flat_a, tree = jax.tree.flatten((variables, left, right))
        put = jax.tree.unflatten(
            tree, [jax.device_put(a, f) for a, f in zip(flat_a, flat_f)])
        call = lambda: np.asarray(comp(*put))
    else:
        f = jax.jit(fn)
        call = lambda: np.asarray(f(variables, left, right))
    call()  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    import jax

    cache = os.path.expanduser("~/.cache/jax_comp")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig

    if FAST_GELU:
        from esmstereo_tpu.nn.blocks import set_gelu_approximate
        set_gelu_approximate(True)

    # Fast-path A/B switches. Defaults MUST mirror the shipped
    # ESMStereoConfig defaults (round-2 lesson: BENCH_FUSE_MIXER
    # defaulting "1" while the model ships fuse_mixer=False re-enabled a
    # kernel whose Mosaic compile exceeds the driver's bench timeout).
    defaults = ESMStereoConfig()
    def _sw(name: str, shipped: bool) -> bool:
        return os.environ.get(name, "1" if shipped else "0") == "1"
    cfg = ESMStereoConfig(
        cv_scale=4, backbone="efficientnet_b2", cost_volume="gwc",
        fuse_mixer=_sw("BENCH_FUSE_MIXER", defaults.fuse_mixer),
        fuse_agg_stem=_sw("BENCH_FUSE_AGG_STEM", defaults.fuse_agg_stem),
        fuse_volume_agg=_sw("BENCH_FUSE_VOLUME_AGG",
                            defaults.fuse_volume_agg),
        fuse_backbone_head=_sw("BENCH_FUSE_HEAD",
                               defaults.fuse_backbone_head),
        volume_int8=_sw("BENCH_VOLUME_INT8", defaults.volume_int8),
        fuse_hourglass=_sw("BENCH_FUSE_HOURGLASS", defaults.fuse_hourglass),
        dtype=jnp.bfloat16 if DTYPE == "bfloat16" else None)
    model = ESMStereo(config=cfg)
    import sys
    print(f"# fast paths: fuse_mixer={cfg.fuse_mixer} "
          f"fuse_agg_stem={cfg.fuse_agg_stem} "
          f"fuse_volume_agg={cfg.fuse_volume_agg} "
          f"fuse_backbone_head={cfg.fuse_backbone_head} "
          f"volume_int8={cfg.volume_int8} "
          f"fuse_hourglass={cfg.fuse_hourglass} "
          f"dtype={DTYPE} fast_gelu={FAST_GELU} "
          f"const_weights={CONST_WEIGHTS} auto_layout={AUTO_LAYOUT}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    left = jax.device_put(
        np.asarray(rng.standard_normal((1, H, W, 3)), dtype=np.float32))
    right = jax.device_put(
        np.asarray(rng.standard_normal((1, H, W, 3)), dtype=np.float32))
    variables = jax.jit(
        lambda l, r: model.init(jax.random.key(0), l, r, train=False)
    )(left, right)

    t_long = _chained_time(model, variables, left, right, N)
    t_short = _chained_time(model, variables, left, right, 1)
    dt = max((t_long - t_short) / (N - 1), 1e-9)

    fps = 1.0 / dt
    # Numerics are part of the metric identity (bf16 vs fp32, tanh vs
    # exact GELU), so vs_baseline always compares like-for-like; baselines
    # are per-metric rows in BENCH_BASELINE.json.
    metric = ("fps_per_chip_960x544_b1_"
              + ("bf16" if DTYPE == "bfloat16" else "fp32")
              + ("_fastgelu" if FAST_GELU else "")
              + ("_constw" if CONST_WEIGHTS else ""))
    baselines: dict = {}
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            raw = json.load(open("BENCH_BASELINE.json"))
            if "metric" in raw:  # legacy single-record format
                baselines = {raw["metric"]: float(raw["value"])}
            else:
                baselines = {k: float(v) for k, v in raw.items()}
        except Exception:
            baselines = {}
    baseline = baselines.get(metric, 0.0)
    vs = round(fps / baseline, 4) if baseline > 0 else 1.0
    result = {
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": vs,
    }
    print(json.dumps(result))
    if baseline == 0.0:
        baselines[metric] = result["value"]
        try:
            with open("BENCH_BASELINE.json", "w") as f:
                json.dump(baselines, f, indent=1)
        except Exception:
            pass


if __name__ == "__main__":
    main()
