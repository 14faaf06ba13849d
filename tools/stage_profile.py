"""Stage-wise latency breakdown of the ESMStereo forward pass on TPU.

Times each pipeline segment (backbone towers, FeatUp, stems+descriptors,
cost volume + 3-D aggregation, regression + ESM upsampler) independently
with the chained-scan methodology (see ``utils.profiling``): N calls are
chained inside one jit with a data dependency and anchored by a D2H copy,
because per-call wall timing on a tunneled TPU measures dispatch rate.

Counterpart of profiling the reference with per-layer CUDA events
(``/root/reference/train_sceneflow.py:254-275`` times only end-to-end;
this tool answers "where do the milliseconds go").

Example:
    python tools/stage_profile.py --height 544 --width 960 --variant L
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
    # confidence variant (S config + LAFNet head), --model_prefix only
    "C": dict(cv_scale=16, backbone="mobilenetv2_100",
              cost_volume="norm_correlation"),
}


def chained_time_ms(fn, args, reps: int = 20) -> float:
    """Chained-scan per-call time of ``fn(*args) -> pytree``.

    The first argument is perturbed each iteration by a 1e-30-scaled
    scalar read from the output, forcing sequential execution.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    def chained(arrs, n):
        def body(carry, _):
            out = fn(*carry)
            # consume EVERY output leaf: an eps fed by only one leaf lets
            # XLA dead-code-eliminate the rest of the stage (this once made
            # the backbone look 4x faster than it is)
            eps = sum(jnp.asarray(l.ravel()[0], jnp.float32)
                      for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "ravel")) * 1e-30
            # perturb EVERY input leaf: an eps fed into only arg 0 lets
            # XLA hoist every computation that does not depend on arg 0
            # out of the scan as loop-invariant (this once made a
            # three-input stage look 8x faster than it is)
            leaves, treedef = jax.tree_util.tree_flatten(carry)
            leaves = [l + eps.astype(l.dtype) for l in leaves]
            return jax.tree_util.tree_unflatten(treedef, leaves), ()

        c, _ = jax.lax.scan(body, arrs, None, length=n)
        return jax.tree_util.tree_leaves(c)[0].ravel()[0]

    times = {}
    for n in (reps + 1, 1):
        f = jax.jit(chained, static_argnums=1)
        np.asarray(f(args, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(args, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[reps + 1] - times[1]) / reps, 1e-9) * 1e3


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variant", default="L", choices=list(VARIANTS))
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fast_gelu", action="store_true",
                   help="tanh-GELU numerics (the deployment headline)")
    p.add_argument("--cost", action="store_true",
                   help="also print XLA's flops/bytes estimate per stage "
                        "and the roofline light-speed time")
    p.add_argument("--cumulative", action="store_true",
                   help="also time progressively longer pipeline prefixes "
                        "(localises layout costs at stage boundaries that "
                        "per-stage timing misses)")
    p.add_argument("--backbone-detail", action="store_true",
                   help="time the backbone stem and each stage separately")
    p.add_argument("--model_prefix", action="store_true",
                   help="variant-generic prefix profiling of the REAL "
                        "model via capture_internals anchors (works for "
                        "M/S too; XLA dead-code-eliminates past each "
                        "anchor)")
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

    from esmstereo_tpu import ops
    from esmstereo_tpu.backbones import ARCHS, FeaturePyramid
    from esmstereo_tpu.models.esmstereo import (ESMStereoConfig, FeatUp,
                                                Upsample4)
    from esmstereo_tpu.models.folded_agg import FoldedAggregation3D
    from esmstereo_tpu.models.phased_upsample import PhUpsample4
    from esmstereo_tpu.nn.blocks import ConvBlock, StemBlock, TorchConv
    from esmstereo_tpu.nn.folded3d import FoldedConvBlock3D
    from esmstereo_tpu.ops.pallas import correlation as pk

    cfg = ESMStereoConfig(
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        **VARIANTS[args.variant])

    if args.model_prefix:
        if args.variant == "C":
            from esmstereo_tpu.models.confidence import ESMStereoConfidence
            model = ESMStereoConfidence(config=cfg)
            anchors = ("f16", "match_left", "cost", "init_pred", "disp",
                       "topv", "embed1", "embed2", "fusion", "out4",
                       "up1_fused", "up1_conf1", "full")
        else:
            from esmstereo_tpu.models import ESMStereo
            model = ESMStereo(config=cfg)
            anchors = ("f16", "match_left", "cost", "init_pred",
                       "disp_2", "full")
        rng0 = np.random.default_rng(0)
        left = jax.device_put(np.asarray(
            rng0.standard_normal((1, args.height, args.width, 3)),
            np.float32))
        right = jax.device_put(np.asarray(
            rng0.standard_normal((1, args.height, args.width, 3)),
            np.float32))
        key0 = jax.random.key(0)
        variables = jax.jit(
            lambda l, r: model.init(key0, l, r, train=False))(left, right)

        def upto(name):
            def fn(l, r):
                res, aux = model.apply(variables, l, r, train=False,
                                       capture_internals=True)
                if name != "full":
                    return aux[name]
                # confidence model: consume BOTH outputs at "full"
                if args.variant == "C":
                    return res[0] + res[1]
                return res[0]
            return fn

        prev = 0.0
        for name in anchors:
            ms = chained_time_ms(upto(name), (left, right), reps=args.reps)
            print(json.dumps({"prefix": name, "ms": round(ms, 3),
                              "delta": round(ms - prev, 3)}), flush=True)
            prev = ms
        return

    if cfg.cv_scale != 4:
        raise SystemExit("stage decomposition implemented for L (cv4) only"
                         " — use --model_prefix for M/S")
    dtype = cfg.dtype
    chans = ARCHS[cfg.backbone].chans

    rng = np.random.default_rng(0)

    def randn(*shape):
        return jax.device_put(
            np.asarray(rng.standard_normal(shape), np.float32))

    key = jax.random.key(0)
    both = randn(2, args.height, args.width, 3)

    report = {}

    def stage_cost(name, fn, *inputs):
        if not args.cost:
            return {}
        from esmstereo_tpu.utils.profiling import Roofline, cost_analysis
        try:
            ca = cost_analysis(fn, *inputs)
        except Exception as e:  # cost analysis can be missing on a backend
            return {"cost_error": str(e)[:80]}
        bits = 16 if args.dtype == "bfloat16" else 32
        ls = Roofline().light_speed_ms(ca["flops"], ca["bytes_accessed"],
                                       dtype_bits=bits)
        return {"gflops": round(ca["flops"] / 1e9, 1),
                "gbytes": round(ca["bytes_accessed"] / 1e9, 3),
                "light_ms": round(ls["light_speed_ms"], 3),
                "bound": ls["bound"]}

    def run_stage(name, module, *inputs, **kw):
        variables = jax.jit(
            lambda *a: module.init(key, *a, **kw))(*inputs)

        def fn(first, *rest):
            return module.apply(variables, first, *rest, **kw)

        ms = chained_time_ms(fn, inputs, reps=args.reps)
        report[name] = round(ms, 3)
        print(json.dumps({"stage": name, "ms": round(ms, 3),
                          **stage_cost(name, fn, *inputs)}), flush=True)
        return jax.jit(fn)(*inputs)

    # --- towers ----------------------------------------------------------
    feature = FeaturePyramid(arch=cfg.backbone, dtype=dtype)
    pyr = run_stage("backbone", feature, both, train=False)

    if args.backbone_detail:
        from esmstereo_tpu.backbones.efficientnet import (
            ARCHS as _ARCHS, DepthwiseSeparable, InvertedResidual, _bn)
        from esmstereo_tpu.nn.blocks import apply_act

        acfg = _ARCHS[cfg.backbone]

        class Stem(fnn.Module):
            dtype: object = None

            @fnn.compact
            def __call__(self, x, *, train=False):
                x = TorchConv(acfg.stem_chs, 3, 2, 1, init_mode="msra",
                              dtype=self.dtype, name="conv_stem")(x)
                x = _bn(train, self.dtype, "bn1")(x)
                return apply_act(x, "relu6")

        class Stage(fnn.Module):
            si: int
            dtype: object = None

            @fnn.compact
            def __call__(self, x, *, train=False):
                for bi, bcfg in enumerate(acfg.stages[self.si]):
                    cls = (DepthwiseSeparable if bcfg.kind == "ds"
                           else InvertedResidual)
                    x = cls(bcfg, acfg.act, dtype=self.dtype,
                            name=f"blocks_{self.si}_{bi}")(x, train=train)
                return x

        x = run_stage("bb_stem", Stem(dtype=dtype), both, train=False)
        for si in range(len(acfg.stages)):
            x = run_stage(f"bb_stage{si}", Stage(si, dtype=dtype), x,
                          train=False)
    featup = FeatUp(chans, cfg.cv_scale, dtype=dtype)
    fl = run_stage("featup", featup, pyr, train=False)

    class Stems(fnn.Module):
        dtype: object = None

        @fnn.compact
        def __call__(self, x, f0, *, train=False):
            s2 = StemBlock(32, dtype=self.dtype, name="stem_2")(x, train=train)
            s4 = StemBlock(48, dtype=self.dtype, name="stem_4")(s2, train=train)
            m = jnp.concatenate([f0, s4], axis=-1)
            m = ConvBlock(64, 3, 1, 1, dtype=self.dtype, name="conv")(
                m, train=train)
            return TorchConv(64, 1, 1, 0, dtype=self.dtype, name="desc")(m), s2

    match_both, stem2_both = run_stage(
        "stems+desc", Stems(dtype=dtype), both, fl[0], train=False)
    match_l, match_r = match_both[:1], match_both[1:]

    # --- cost volume + aggregation ---------------------------------------
    num_bins = cfg.max_disp // cfg.cv_scale
    red, add = cfg.reduction, 16

    def vol_fn(ml, mr):
        return pk.correlation_volume_folded(ml, mr, num_bins, cfg.num_groups)

    if not args.cpu:
        ms = chained_time_ms(vol_fn, (match_l, match_r), reps=args.reps)
        report["pallas_volume"] = round(ms, 3)
        print(json.dumps({"stage": "pallas_volume", "ms": round(ms, 3)}),
              flush=True)
        volume = jax.jit(vol_fn)(match_l, match_r)
    else:
        volume = ops.build_gwc_volume_folded(
            match_l, match_r, num_bins, cfg.num_groups)

    class Agg(fnn.Module):
        dtype: object = None

        @fnn.compact
        def __call__(self, v, *, train=False):
            v = FoldedConvBlock3D(red, cfg.num_groups, num_bins, 3, 1, 1,
                                  dtype=self.dtype, name="group_stem")(
                v, train=train)
            v = FoldedConvBlock3D(red, red, num_bins, 3, 1, 1,
                                  dtype=self.dtype, name="agg")(v, train=train)
            return FoldedAggregation3D(red, add, num_bins, dtype=self.dtype,
                                       name="aggregation_out")(v, train=train)

    cost_folded = run_stage("agg3d", Agg(dtype=dtype), volume,
                            train=False)
    cost = jnp.moveaxis(cost_folded, -1, 1).astype(jnp.float32)

    # --- regression + upsampler ------------------------------------------
    init_pred = jax.jit(lambda c: ops.regression_topk(c, None, 2))(cost)
    f1x, f0x = fl[1][:1], fl[0][:1]
    s2 = stem2_both[:1]

    for name, cls in (("upsample_phased", PhUpsample4),
                      ("upsample_plain", Upsample4)):
        mod = cls(dtype=dtype, name="upsample_module")
        variables = jax.jit(
            lambda a, b, c, d: mod.init(key, a, b, c, d, train=False)
        )(f1x, f0x, s2, init_pred)

        def fn(ip, a, b, c):
            return mod.apply(variables, a, b, c, ip, train=False)

        ms = chained_time_ms(fn, (init_pred, f1x, f0x, s2), reps=args.reps)
        report[name] = round(ms, 3)
        print(json.dumps({"stage": name, "ms": round(ms, 3)}), flush=True)

    def regress(c):
        return ops.regression_topk(c, None, 2)

    ms = chained_time_ms(regress, (cost,), reps=args.reps)
    report["regression"] = round(ms, 3)
    print(json.dumps({"stage": "regression", "ms": round(ms, 3)}), flush=True)

    total = (report.get("backbone", 0) + report.get("featup", 0)
             + report.get("stems+desc", 0) + report.get("pallas_volume", 0)
             + report.get("agg3d", 0) + report.get("regression", 0)
             + report.get("upsample_phased", 0))
    print(json.dumps({"stage": "SUM(stages)", "ms": round(total, 3)}),
          flush=True)

    if not args.cumulative:
        return

    # Recompose the full pipeline from the same stage modules/params and
    # time progressively longer prefixes: the delta between consecutive
    # prefixes includes any layout copies XLA inserts AT the boundary,
    # which per-stage timing (with freshly-laid-out inputs) misses.
    stems_mod = Stems(dtype=dtype)
    stems_vars = jax.jit(
        lambda *a: stems_mod.init(key, *a, train=False))(both, fl[0])
    feature_vars = jax.jit(
        lambda a: feature.init(key, a, train=False))(both)
    featup_vars = jax.jit(
        lambda a: featup.init(key, a, train=False))(pyr)
    agg_mod = Agg(dtype=dtype)
    agg_vars = jax.jit(
        lambda a: agg_mod.init(key, a, train=False))(volume)
    ups_mod = PhUpsample4(dtype=dtype, name="upsample_module")
    ups_vars = jax.jit(
        lambda a, b, c, d: ups_mod.init(key, a, b, c, d, train=False)
    )(f1x, f0x, s2, init_pred)

    def prefix(upto):
        def fn(x):
            pyr_ = feature.apply(feature_vars, x, train=False)
            fl_ = featup.apply(featup_vars, pyr_, train=False)
            m_, s2_ = stems_mod.apply(stems_vars, x, fl_[0], train=False)
            if upto == "towers":
                return m_
            vol_ = vol_fn(m_[:1], m_[1:])
            if upto == "volume":
                return vol_
            cf_ = agg_mod.apply(agg_vars, vol_, train=False)
            if upto == "agg3d":
                return cf_
            cost_ = jnp.moveaxis(cf_, -1, 1).astype(jnp.float32)
            ip_ = ops.regression_topk(cost_, None, 2)
            if upto == "regression":
                return ip_
            return ups_mod.apply(ups_vars, fl_[1][:1], fl_[0][:1], s2_[:1],
                                 ip_, train=False)
        return fn

    prev = 0.0
    for upto in ("towers", "volume", "agg3d", "regression", "full"):
        ms = chained_time_ms(prefix(upto), (both,), reps=args.reps)
        print(json.dumps({"cumulative": upto, "ms": round(ms, 3),
                          "delta": round(ms - prev, 3)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
