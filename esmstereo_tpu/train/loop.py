"""Training-loop harness: the engine behind the train CLIs.

Mirrors the reference driver behaviour (``/root/reference/
train_sceneflow.py`` / ``train_kitti.py``): epoch loop with LR decay,
per-iteration console logging, per-epoch checkpointing and full-test
evaluation with best-metric tracking — on top of the jitted fused train
step and (optionally) a device mesh for DP/SP sharding.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu.parallel import mesh as pmesh
from esmstereo_tpu.train import checkpoints as ckpt
from esmstereo_tpu.train.schedule import lr_schedule_fn
from esmstereo_tpu.train.state import create_train_state, make_optimizer
from esmstereo_tpu.train.step import make_eval_step, make_train_step
from esmstereo_tpu.utils.meters import AverageMeter, AverageMeterDict, save_scalars
from esmstereo_tpu.utils.trees import save_images


@dataclasses.dataclass
class TrainLoopConfig:
    epochs: int = 60
    lr: float = 1e-3
    lrepochs: str = "20,32,40,48,56:2"
    optimizer: str = "adamw"
    logdir: str = "./logs"
    resume: bool = False
    loadckpt: str = ""
    save_freq: int = 1
    summary_freq: int = 1
    max_batches_per_epoch: int | None = None   # KITTI caps at 100
    select_metric: str = "EPE"                 # KITTI selects on D1
    fix_cv16_loss: bool = False
    seed: int = 1
    # TensorBoard image dumps (left / GT / estimate / error map) every
    # `image_freq` steps; 0 = off. Capability surface of the reference's
    # save_images (experiment.py:80-100); images come from an eval-mode
    # forward on the current batch with the just-updated params.
    image_freq: int = 0


def _to_device(batch: dict, mesh=None) -> dict:
    jbatch = {}
    for k, v in batch.items():
        if isinstance(v, list) and v and isinstance(v[0], np.ndarray):
            jbatch[k] = [jnp.asarray(x) for x in v]
        elif isinstance(v, np.ndarray) and v.dtype != object:
            jbatch[k] = jnp.asarray(v)
    if mesh is not None:
        jbatch = pmesh.shard_batch(mesh, jbatch)
    return jbatch


def _train_batch_view(batch: dict) -> dict:
    return {k: batch[k] for k in ("left", "right", "disparity",
                                  "disparity_low") if k in batch}


def _device_batches(loader, mesh, view, limit=None):
    """Yield ``(device_batch, host_batch)`` one step AHEAD of consumption:
    batch i+1's host-to-device transfer is dispatched before batch i is
    consumed, so it overlaps step i's device execution (the loader's
    worker threads already overlap decode/augment on the host side)."""
    prev = None
    for bi, batch in enumerate(loader):
        if limit is not None and bi >= limit:
            break
        dev = _to_device(view(batch), mesh)
        if prev is not None:
            yield prev
        prev = (dev, batch)
    if prev is not None:
        yield prev


def _eval_batch_view(batch: dict) -> dict:
    return {k: batch[k] for k in ("left", "right", "disparity") if k in batch}


def run_training(model, cfg: TrainLoopConfig, train_loader, test_loader,
                 *, mesh=None, logger=None,
                 log_fn: Callable[[str], None] = print) -> dict:
    """Run the full recipe; returns {'best_epoch', 'best_metric'}."""
    os.makedirs(cfg.logdir, exist_ok=True)

    steps_per_epoch = len(train_loader)
    if cfg.max_batches_per_epoch:
        steps_per_epoch = min(steps_per_epoch, cfg.max_batches_per_epoch)

    sample = next(iter(train_loader))
    lr_fn = lr_schedule_fn(cfg.lr, cfg.lrepochs, steps_per_epoch)
    state = create_train_state(
        model, jax.random.key(cfg.seed), _to_device(sample),
        make_optimizer(cfg.optimizer, lr_fn))

    start_epoch = 0
    if cfg.resume:
        latest = ckpt.latest_checkpoint(cfg.logdir)
        if latest:
            log_fn(f"resuming from {latest}")
            state, start_epoch = ckpt.restore_checkpoint(latest, state)
    elif cfg.loadckpt:
        log_fn(f"warm-starting from {cfg.loadckpt}")
        state = ckpt.warm_start(cfg.loadckpt, state)

    train_step = jax.jit(make_train_step(model, fix_cv16=cfg.fix_cv16_loss),
                         donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(model))

    if mesh is not None:
        state = jax.device_put(state, pmesh.replicated(mesh))

    best_epoch, best_metric = -1, float("inf")
    for epoch in range(start_epoch, cfg.epochs):
        train_loader.set_epoch(epoch)
        loss_m, epe_m, d1_m = AverageMeter(), AverageMeter(), AverageMeter()
        t_epoch = time.time()

        # Depth-1 dispatch pipeline: metrics of step i are read back (a
        # blocking D2H) only AFTER step i+1 has been dispatched, so the
        # host never idles the device on a per-step sync; batch H2D is
        # prefetched one step ahead by _device_batches. Console/TB
        # logging therefore lags execution by one step.
        def flush(pending):
            bi, gstep, metrics, host_batch, t0, disp_est = pending
            metrics = {k: float(v) for k, v in metrics.items()}
            loss_m.update(metrics["loss"])
            epe_m.update(metrics["EPE"])
            d1_m.update(metrics["D1"])
            if logger is not None and gstep % cfg.summary_freq == 0:
                save_scalars(logger, "train",
                             {"loss": metrics["loss"],
                              "EPE": [metrics["EPE"]],
                              "D1": [metrics["D1"]]}, gstep)
            if disp_est is not None:
                # Dispatched at step `gstep` with that step's just-updated
                # params (the one-step-late flush can't eval here: step
                # gstep's state buffers were donated to step gstep+1).
                est = np.asarray(disp_est[0])          # (H, W)
                gt = np.asarray(host_batch["disparity"][0])
                save_images(logger, "train", {
                    "imgL": np.asarray(host_batch["left"][0]),  # (H, W, 3)
                    "disp_gt": gt,
                    "disp_est": est,
                    "errormap": np.abs(est - gt) * (gt > 0),
                }, gstep)
            log_fn(
                f"Epoch {epoch}/{cfg.epochs} | Iter {bi}/{steps_per_epoch} | "
                f"loss {metrics['loss']:.3f}({loss_m.avg:.3f}) | "
                f"EPE {metrics['EPE']:.3f}({epe_m.avg:.3f}) | "
                f"D1 {metrics['D1']:.3f}({d1_m.avg:.3f}) | "
                f"time {time.time() - t0:.3f}")

        pending = None
        for bi, (dev_batch, host_batch) in enumerate(_device_batches(
                train_loader, mesh, _train_batch_view,
                limit=cfg.max_batches_per_epoch)):
            gstep = steps_per_epoch * epoch + bi
            t0 = time.time()
            state, metrics = train_step(state, dev_batch)
            disp_est = None
            if (logger is not None and cfg.image_freq
                    and gstep % cfg.image_freq == 0):
                # async dispatch now, D2H read-back in the late flush
                tb = _to_device(_eval_batch_view(host_batch), mesh)
                _, disp_est = eval_step(state, tb)
            if pending is not None:
                flush(pending)
            pending = (bi, gstep, metrics, host_batch, t0, disp_est)
        if pending is not None:
            flush(pending)

        if (epoch + 1) % cfg.save_freq == 0:
            path = ckpt.save_checkpoint(cfg.logdir, state, epoch)
            log_fn(f"saved {path}")

        # full-test evaluation
        if test_loader is not None:
            avg = AverageMeterDict()
            for batch in test_loader:
                metrics, _ = eval_step(
                    state, _to_device(_eval_batch_view(batch), mesh))
                avg.update({k: [float(v)] if k != "loss" else float(v)
                            for k, v in metrics.items()})
            means = avg.mean()
            if logger is not None:
                save_scalars(logger, "fulltest", means,
                             steps_per_epoch * (epoch + 1))
            sel = means[cfg.select_metric]
            sel = sel[0] if isinstance(sel, list) else sel
            if sel < best_metric:
                best_metric, best_epoch = sel, epoch
            log_fn(f"avg_test_scalars {means}")
            log_fn(f"MAX epoch {best_epoch} total test "
                   f"{cfg.select_metric} = {best_metric:.5f}")
        log_fn(f"epoch {epoch} took {time.time() - t_epoch:.1f}s")

    return {"best_epoch": best_epoch, "best_metric": best_metric}


def measure_performance(model, variables, *, height: int = 512,
                        width: int = 960, reps: int = 50) -> float:
    """Mean forward latency in ms (``train_sceneflow.py:254-275`` harness).

    Uses the chained-scan methodology (iterations chained inside one jit,
    D2H anchor) rather than the reference's per-call event timing:
    ``block_until_ready`` does not reliably block on tunneled TPU
    platforms, so a dispatch loop would measure dispatch rate, not device
    time (see BASELINE.md "Measurement methodology").
    """
    from esmstereo_tpu.utils.profiling import chained_scan_time_ms

    rng = np.random.default_rng(0)
    left = jax.device_put(
        np.asarray(rng.standard_normal((1, height, width, 3)), np.float32))
    right = jax.device_put(
        np.asarray(rng.standard_normal((1, height, width, 3)), np.float32))

    def forward(v, l, r):
        return model.apply(v, l, r, train=False)[0]

    return chained_scan_time_ms(forward, variables, left, right, reps=reps)
