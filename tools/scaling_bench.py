"""Scaling benchmark: train-step time vs mesh size.

Measures strong/weak-scaling efficiency of the fused train step over the
available devices (the BASELINE north star's >=85%-at-N-hosts target).
On a single chip this reports the one-device number; on a pod slice or the
fake CPU mesh it sweeps data-parallel widths:

  weak scaling:  per-device batch fixed, global batch grows with devices —
                 efficiency = t(1) / t(N)
  strong scaling: global batch fixed — efficiency = t(1) / (N * t(N))
"""

from __future__ import annotations

import argparse
import json
import time

from common import add_model_args, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU scaling bench")
    add_model_args(p)
    p.add_argument("--per_device_batch", type=int, default=1)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--mode", default="weak", choices=["weak", "strong"])
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--cpu_devices", type=int, default=8)
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{args.cpu_devices}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from esmstereo_tpu.data.synthetic import make_batch
    from esmstereo_tpu.models import ESMStereo
    from esmstereo_tpu.parallel import mesh as pmesh
    from esmstereo_tpu.train.state import create_train_state, make_optimizer
    from esmstereo_tpu.train.step import make_train_step

    model = ESMStereo(config=build_config(args))
    n_dev = len(jax.devices())
    widths = [w for w in (1, 2, 4, 8, 16, 32) if w <= n_dev]
    rng = np.random.default_rng(0)

    results = []
    t1 = None
    for width in widths:
        if args.mode == "weak":
            batch_n = args.per_device_batch * width
        else:
            batch_n = args.per_device_batch * max(widths)
            if batch_n % width:
                continue
        b = make_batch(rng, batch=batch_n, h=args.height, w=args.width)
        batch = {k: (jnp.asarray(v) if not isinstance(v, list)
                     else [jnp.asarray(x) for x in v]) for k, v in b.items()}
        mesh = (pmesh.make_mesh(pmesh.MeshConfig(data=width, spatial=1))
                if width > 1 else None)
        if mesh is not None:
            batch = pmesh.shard_batch(mesh, batch)
        state = create_train_state(model, jax.random.key(0), batch,
                                   make_optimizer("adamw", 1e-3))
        if mesh is not None:
            state = jax.device_put(state, pmesh.replicated(mesh))
        step = jax.jit(make_train_step(model), donate_argnums=(0,))
        # the timed loop is data-dependent through the donated state, so a
        # D2H read of the LAST step's metrics anchors the whole chain —
        # honest on tunneled TPUs where block_until_ready does not block
        state, m = step(state, batch)
        float(jax.tree_util.tree_leaves(m)[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, m = step(state, batch)
        float(jax.tree_util.tree_leaves(m)[0])
        dt = (time.perf_counter() - t0) / args.reps
        if t1 is None:
            t1 = dt
        eff = (t1 / dt if args.mode == "weak" else t1 / (width * dt))
        results.append({"devices": width, "global_batch": batch_n,
                        "step_ms": round(dt * 1e3, 2),
                        "images_per_s": round(batch_n / dt, 2),
                        "efficiency": round(eff, 4)})
        print(json.dumps(results[-1]))


if __name__ == "__main__":
    main()
