"""Profiling & tracing: latency harness, profiler traces, roofline math.

TPU-native replacement for the reference's CUDA-event timing
(``train_sceneflow.py:254-275``, ``save_vid.py:139-157``): async dispatch +
``block_until_ready`` for wall-clock, ``jax.profiler`` for device traces
(viewable in TensorBoard / Perfetto), and a simple roofline accounting
helper for kernel analysis.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax


def time_fn(fn: Callable, *args, warmup: int = 10, reps: int = 100) -> dict:
    """Mean/std wall-clock of a jitted fn in ms (device-resident args!).

    Inputs must already be on device (``jax.device_put``) — feeding host
    numpy pays a per-call transfer that dominates on remote-attached TPUs.

    Completion is anchored by a device-to-host read of the first output
    leaf (``block_until_ready`` does not reliably block on tunneled TPU
    platforms), so per-call numbers include one D2H round-trip; the
    amortised loop is NOT data-dependent between iterations, so on an
    async backend it can overlap and measure closer to throughput than
    latency. For clean per-frame device latency use
    :func:`chained_scan_time_ms`.
    """
    import numpy as np

    def anchor(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    for _ in range(warmup):
        anchor(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        anchor(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    # amortised (pipelined) timing as the throughput number
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    anchor(out)
    amortised = (time.perf_counter() - t0) / reps * 1e3
    return {
        "mean_ms": float(np.mean(times)),
        "std_ms": float(np.std(times)),
        "min_ms": float(np.min(times)),
        "amortised_ms": amortised,
        "fps": 1e3 / amortised,
    }


def chained_scan_time_ms(apply_fn: Callable, variables, left, right,
                         reps: int = 20) -> float:
    """Per-frame device time via iterations chained inside one jit.

    On remotely-attached (tunneled) TPUs ``block_until_ready`` does not
    reliably block, so per-call wall timing measures dispatch rate. This
    harness chains ``reps+1`` forward passes inside a single jit with a
    data dependency between iterations (the disparity output perturbs the
    next left image by a factor of 1e-30), anchors completion with a D2H
    transfer, and reports ``(t(N) - t(1)) / (N - 1)`` — which also cancels
    the host round-trip. See BASELINE.md "Measurement methodology".

    ``apply_fn(variables, left, right) -> disp (B, H, W)`` must be pure.
    """
    import jax.numpy as jnp
    import numpy as np

    n_long = reps + 1

    def chained(v, l, r, n):
        def body(carry, _):
            li, ri = carry
            d = apply_fn(v, li, ri)
            # perturb BOTH eyes: with a left-only dependency XLA hoists
            # every right-only subgraph out of the scan as loop-invariant
            # (harmless under siamese batching, where every op consumes
            # the [left; right] concat, but a silent 2x lie otherwise)
            eps = (d * 1e-30)[..., None].astype(li.dtype)
            return (li + eps, ri + eps), ()

        (lf, _), _ = jax.lax.scan(body, (l, r), None, length=n)
        return lf[0, 0, 0]

    times = {}
    for n in (n_long, 1):
        f = jax.jit(chained, static_argnums=3)
        np.asarray(f(variables, left, right, n))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(variables, left, right, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[n_long] - times[1]) / reps, 1e-9) * 1e3


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): fn()``.

    View with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Per-chip roofline model (defaults: TPU v5e)."""

    peak_flops: float = 197e12       # bf16 FLOP/s
    peak_flops_f32: float = 98.5e12
    hbm_bandwidth: float = 819e9     # bytes/s

    def light_speed_ms(self, flops: float, bytes_accessed: float,
                       dtype_bits: int = 32) -> dict:
        peak = self.peak_flops_f32 if dtype_bits == 32 else self.peak_flops
        t_compute = flops / peak
        t_memory = bytes_accessed / self.hbm_bandwidth
        bound = "compute" if t_compute > t_memory else "memory"
        return {
            "compute_ms": t_compute * 1e3,
            "memory_ms": t_memory * 1e3,
            "light_speed_ms": max(t_compute, t_memory) * 1e3,
            "bound": bound,
            "arithmetic_intensity": flops / max(bytes_accessed, 1),
        }


def cost_analysis(fn: Callable, *args) -> dict:
    """XLA's own FLOP/byte estimate for a jitted function."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analyses = compiled.cost_analysis()
    ca = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
    return {
        "flops": ca.get("flops", -1.0),
        "bytes_accessed": ca.get("bytes accessed", -1.0),
    }
