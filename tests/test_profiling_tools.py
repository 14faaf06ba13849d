"""Coverage for the profiling utilities and the scaling benchmark CLI
(the two previously-untested modules: utils/profiling.py roofline/cost
paths and tools/scaling_bench.py)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu.utils.profiling import (
    Roofline,
    chained_scan_time_ms,
    cost_analysis,
    time_fn,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_roofline_model():
    r = Roofline()
    # memory-bound case: tiny FLOPs, big bytes
    m = r.light_speed_ms(flops=1e9, bytes_accessed=8.19e9)
    assert m["bound"] == "memory"
    assert m["light_speed_ms"] == m["memory_ms"]
    assert abs(m["memory_ms"] - 10.0) < 0.1  # 8.19 GB / 819 GB/s
    # compute-bound case
    c = r.light_speed_ms(flops=98.5e12 * 0.05, bytes_accessed=1e6)
    assert c["bound"] == "compute"
    assert abs(c["compute_ms"] - 50.0) < 0.5
    assert c["arithmetic_intensity"] > 1e6


def test_cost_analysis_reports_flops():
    def f(a, b):
        return a @ b

    a = jnp.zeros((256, 256))
    res = cost_analysis(f, a, a)
    # 2*M*N*K FLOPs for the matmul
    assert res["flops"] >= 2 * 256 ** 3 * 0.9, res
    assert res["bytes_accessed"] > 0


def test_time_fn_and_chained_scan():
    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    x = jnp.ones((64, 64))
    stats = time_fn(f, x, warmup=2, reps=5)
    assert stats["mean_ms"] > 0 and stats["amortised_ms"] > 0
    assert np.isfinite(stats["fps"])

    def apply_fn(v, l, r):
        return (l + r + v)[..., 0]

    t = chained_scan_time_ms(apply_fn, jnp.zeros(()), jnp.ones((1, 8, 8, 1)),
                             jnp.ones((1, 8, 8, 1)), reps=3)
    assert t > 0


def test_scaling_bench_cli():
    """Drive the scaling benchmark end-to-end on a fake CPU mesh: it must
    emit one JSON line per mesh width with finite efficiencies."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/scaling_bench.py"),
         "--cpu", "--cpu_devices", "2", "--height", "64", "--width", "64",
         "--reps", "2", "--backbone", "mobilenetv2_100", "--cv_scale", "4"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.join(REPO, "tools"), env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    assert len(rows) == 2, out.stdout
    assert rows[0]["devices"] == 1 and rows[1]["devices"] == 2
    for r in rows:
        assert r["step_ms"] > 0 and np.isfinite(r["efficiency"])
        assert r["images_per_s"] > 0
