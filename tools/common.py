"""Shared CLI plumbing for the driver scripts."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def add_model_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--model", default="ESMStereo",
                        choices=["ESMStereo", "ESMStereo_trt",
                                 "ESMStereo_confidence"])
    parser.add_argument("--backbone", default="efficientnet_b2",
                        choices=["mobilenetv2_100", "efficientnet_b2"])
    parser.add_argument("--maxdisp", type=int, default=192)
    parser.add_argument("--cv_scale", type=int, default=4,
                        choices=[16, 8, 4],
                        help="cost volume scale factor (L/M/S = 4/8/16)")
    parser.add_argument("--cv", type=str, default="gwc",
                        choices=["norm_correlation", "gwc"])
    parser.add_argument("--pallas", action="store_true",
                        help="use the materializing Pallas correlation "
                             "kernel (default: XLA-fused jnp volume, which "
                             "benches faster)")
    # kept for backwards compatibility; the fused path is now the default
    parser.add_argument("--no_pallas", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="compute dtype (params stay float32; bfloat16 "
                             "doubles MXU throughput, counterpart of the "
                             "reference's fp16 TensorRT deployment engines). "
                             "Disparity regression and the residual stream "
                             "always run in float32.")


def build_config(args):
    import jax.numpy as jnp

    from esmstereo_tpu.models import ESMStereoConfig
    return ESMStereoConfig(
        max_disp=args.maxdisp,
        cost_volume=args.cv,
        backbone=args.backbone,
        cv_scale=args.cv_scale,
        use_pallas=args.pallas and not args.no_pallas,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
    )


def add_runtime_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (the framework's "
                             "sanitizer mode: fail fast on NaN/Inf)")
    parser.add_argument("--fast_gelu", action="store_true",
                        help="tanh-approximate GELU (+~14%% inference fps, "
                             "<1e-3 activation difference vs exact erf)")


def apply_runtime_flags(args) -> None:
    if getattr(args, "cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "debug_nans", False):
        import jax
        jax.config.update("jax_debug_nans", True)
    if getattr(args, "fast_gelu", False):
        from esmstereo_tpu.nn.blocks import set_gelu_approximate
        set_gelu_approximate(True)


def cpu_devices_if_requested(args) -> None:
    apply_runtime_flags(args)
