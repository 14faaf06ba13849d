"""Training-throughput benchmark: device step time vs pipeline wall time.

Counterpart of the reference's per-iteration training timing
(``/root/reference/train_sceneflow.py:181-194`` prints ``time = {:.3f}``
per batch), made honest for a tunneled TPU:

1. **Device step time** — N fused train steps (fwd+loss+bwd+opt+metrics)
   chained inside ONE jit via ``lax.scan`` carrying the full train state,
   anchored by a D2H read. This is the pure per-step device cost; no
   host, no input pipeline.
2. **Pipeline wall time** — the actual ``run_training`` depth-1 dispatch
   pipeline (H2D prefetch one step ahead, metrics flushed one step late)
   over a synthetic on-disk SceneFlow tree with the real DataLoader and
   augmentation stack. Steady-state wall/step measures what the loop
   delivers end to end; ``overlap_efficiency = device/wall`` is how much
   of the loader+H2D cost the pipeline hides.

Prints one JSON line per measurement.

Usage:
    python tools/train_bench.py [--batch 4] [--steps 30] [--pairs 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CROP_H, CROP_W = 256, 512          # SceneFlow recipe crop (train_sceneflow.py:94)
FULL_H, FULL_W = 540, 960


def device_step_ms(model, batch_size: int, reps: int) -> float:
    """Chained-scan device time of the fused train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from esmstereo_tpu.train.state import create_train_state, make_optimizer
    from esmstereo_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)

    def synth(shape):
        return jax.device_put(
            np.asarray(rng.standard_normal(shape), np.float32))

    batch = {
        "left": synth((batch_size, CROP_H, CROP_W, 3)),
        "right": synth((batch_size, CROP_H, CROP_W, 3)),
        "disparity": jax.device_put(np.asarray(
            rng.uniform(1, 100, (batch_size, CROP_H, CROP_W)), np.float32)),
        # GT pyramid layout of the datasets (data/datasets.py)
        "disparity_low": [jax.device_put(np.asarray(
            rng.uniform(1, 100 / r,
                        (batch_size, CROP_H // r, CROP_W // r)),
            np.float32)) for r in (2, 4, 8, 16)],
    }
    state = create_train_state(
        model, jax.random.key(0), batch,
        make_optimizer("adamw", lambda _: 1e-3))
    step = make_train_step(model)

    def chained(st, b, n):
        def body(carry, _):
            new_st, _metrics = step(carry, b)
            return new_st, ()

        final, _ = jax.lax.scan(body, st, None, length=n)
        return jax.tree_util.tree_leaves(final.params)[0].ravel()[0]

    times = {}
    for n in (reps + 1, 1):
        f = jax.jit(chained, static_argnums=2)
        np.asarray(f(state, batch, n))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(state, batch, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[reps + 1] - times[1]) / reps, 1e-9) * 1e3


def make_tree(root: str, pairs: int) -> None:
    import numpy as np
    from PIL import Image

    from esmstereo_tpu.data.io import pfm_imwrite

    rng = np.random.default_rng(0)
    lines = []
    for i in range(pairs):
        for side in "lr":
            Image.fromarray(rng.integers(
                0, 255, (FULL_H, FULL_W, 3), dtype=np.uint8)).save(
                    os.path.join(root, f"{side}{i}.png"))
        pfm_imwrite(os.path.join(root, f"d{i}.pfm"),
                    rng.uniform(1, 150, (FULL_H, FULL_W)).astype(np.float32))
        lines.append(f"l{i}.png r{i}.png d{i}.pfm")
    with open(os.path.join(root, "list.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def pipeline_wall_ms(model, batch_size: int, steps: int, pairs: int,
                     workers: int, use_processes: bool) -> float:
    """Steady-state wall/step of the depth-1 dispatch pipeline over a
    real on-disk loader (decode + full reference augmentation)."""
    import numpy as np

    from esmstereo_tpu.data.datasets import SceneFlowDataset
    from esmstereo_tpu.data.loader import DataLoader
    from esmstereo_tpu.train.loop import (
        _device_batches, _to_device, _train_batch_view)
    from esmstereo_tpu.train.state import create_train_state, make_optimizer
    from esmstereo_tpu.train.step import make_train_step
    import jax

    with tempfile.TemporaryDirectory() as root:
        make_tree(root, pairs)
        ds = SceneFlowDataset(root, os.path.join(root, "list.txt"),
                              training=True, crop=(CROP_H, CROP_W))
        loader = DataLoader(ds, batch_size, num_workers=workers,
                            use_processes=use_processes)

        state = create_train_state(
            model, jax.random.key(0),
            _to_device(_train_batch_view(next(iter(loader)))),
            make_optimizer("adamw", lambda _: 1e-3))
        train_step = jax.jit(make_train_step(model), donate_argnums=(0,))

        def run(n_steps: int) -> float:
            nonlocal state
            done, pending, t0 = 0, None, time.perf_counter()
            while done < n_steps:
                loader.set_epoch(done)
                for dev, _host in _device_batches(
                        loader, None, _train_batch_view):
                    state, metrics = train_step(state, dev)
                    if pending is not None:   # late flush = D2H block
                        float(pending["loss"])
                    pending = metrics
                    done += 1
                    if done >= n_steps:
                        break
            if pending is not None:
                float(pending["loss"])
            return (time.perf_counter() - t0) * 1e3 / n_steps

        run(2)                      # compile + warm the worker pool
        return run(steps)


def main() -> None:
    global CROP_H, CROP_W
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--pairs", type=int, default=16)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--use_processes", type=int, default=1)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip_pipeline", action="store_true")
    p.add_argument("--crop_h", type=int, default=CROP_H,
                   help="override recipe crop (smoke tests)")
    p.add_argument("--crop_w", type=int, default=CROP_W)
    p.add_argument("--backbone", default="efficientnet_b2")
    args = p.parse_args()
    CROP_H, CROP_W = args.crop_h, args.crop_w

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig

    model = ESMStereo(config=ESMStereoConfig(
        cv_scale=4, backbone=args.backbone))

    dev_ms = device_step_ms(model, args.batch, args.steps)
    print(json.dumps({
        "metric": "train_step_device_ms",
        "value": round(dev_ms, 2),
        "images_per_s_per_chip": round(1e3 / dev_ms * args.batch, 2),
        "batch": args.batch, "crop": f"{CROP_H}x{CROP_W}",
    }), flush=True)

    if not args.skip_pipeline:
        wall_ms = pipeline_wall_ms(model, args.batch, args.steps,
                                   args.pairs, args.workers,
                                   bool(args.use_processes))
        print(json.dumps({
            "metric": "train_step_pipeline_wall_ms",
            "value": round(wall_ms, 2),
            "images_per_s_per_chip": round(1e3 / wall_ms * args.batch, 2),
            "overlap_efficiency": round(dev_ms / wall_ms, 3),
            "batch": args.batch, "crop": f"{CROP_H}x{CROP_W}",
        }), flush=True)


if __name__ == "__main__":
    main()
