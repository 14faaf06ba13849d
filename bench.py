"""Benchmark: frames/s/chip for the flagship ESMStereo-L forward pass.

Mirrors the reference's latency harness (``train_sceneflow.py:254-275``:
10 warmups + timed reps, batch 1) at the driver's 960x540 target (padded to
960x544 for /32 divisibility, as every reference eval path pads/crops to
/32 multiples).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio against the last recorded value in
``BENCH_BASELINE.json`` if present (self-relative; the reference publishes
no numbers — BASELINE.md), else 1.0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

H, W = 544, 960
WARMUP = 10
REPS = int(os.environ.get("BENCH_REPS", "100"))


def main() -> None:
    import jax

    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig

    cfg = ESMStereoConfig(cv_scale=4, backbone="efficientnet_b2",
                          cost_volume="gwc", use_pallas=True)
    model = ESMStereo(config=cfg)

    rng = np.random.default_rng(0)
    left = np.asarray(rng.standard_normal((1, H, W, 3)), dtype=np.float32)
    right = np.asarray(rng.standard_normal((1, H, W, 3)), dtype=np.float32)

    variables = jax.jit(
        lambda l, r: model.init(jax.random.key(0), l, r, train=False)
    )(left, right)

    @jax.jit
    def forward(variables, left, right):
        return model.apply(variables, left, right, train=False)[0]

    left = jax.device_put(left)
    right = jax.device_put(right)

    for _ in range(WARMUP):
        forward(variables, left, right).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = forward(variables, left, right)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / REPS

    fps = 1.0 / dt
    baseline = 0.0
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            baseline = float(json.load(open("BENCH_BASELINE.json"))["value"])
        except Exception:
            baseline = 0.0
    vs = round(fps / baseline, 4) if baseline > 0 else 1.0
    result = {
        "metric": "fps_per_chip_960x544_b1_fp32",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": vs,
    }
    print(json.dumps(result))
    if baseline == 0.0:
        # record the first measurement as the self-relative baseline
        try:
            with open("BENCH_BASELINE.json", "w") as f:
                json.dump(result, f)
        except Exception:
            pass


if __name__ == "__main__":
    main()
