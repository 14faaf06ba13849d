"""Jitted train / eval step factories.

One fused ``train_step``: forward (with batch-stat updates), multi-scale
masked loss, gradients, optimizer update, and EPE/D1 metrics — a single XLA
program per step, the TPU-native equivalent of the reference's
``train_sample`` (``train_sceneflow.py:196-227``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from esmstereo_tpu.models.losses import (
    disparity_masks,
    model_loss_test,
    model_loss_train,
)
from esmstereo_tpu.utils.metrics import d1_metric, epe_metric, eval_metrics


def make_train_step(model, *, fix_cv16: bool = False):
    cfg = model.config
    cv_scale = cfg.cv_scale
    max_disp = cfg.max_disp

    def train_step(state, batch):
        gts = [batch["disparity"], *batch["disparity_low"]]
        masks = disparity_masks(gts, max_disp)

        def loss_fn(params):
            outs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["left"], batch["right"], train=True,
                mutable=["batch_stats"])
            loss = model_loss_train(outs, gts, masks, cv_scale,
                                    fix_cv16=fix_cv16)
            return loss, (outs, mutated)

        (loss, (outs, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=mutated["batch_stats"])
        metrics = {
            "loss": loss,
            "EPE": epe_metric(outs[0], gts[0], masks[0]),
            "D1": d1_metric(outs[0], gts[0], masks[0]),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model):
    max_disp = model.config.max_disp

    def eval_step(state, batch):
        outs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["left"], batch["right"], train=False)
        gt = batch["disparity"]
        mask = (gt > 0) & (gt < max_disp)
        metrics = eval_metrics(outs[0], gt, mask)
        metrics["loss"] = model_loss_test(outs, [gt], [mask])
        return metrics, outs[0]

    return eval_step


def make_infer_fn(model):
    """Eval-mode forward returning the full-res disparity only."""

    def infer(variables, left, right):
        return model.apply(variables, left, right, train=False)[0]

    return infer
