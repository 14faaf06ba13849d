"""Disparity evaluation metrics (masked, per-image, batch-mean).

Reference semantics: ``/root/reference/utils/metrics.py``:

  * per-image masked metric, then mean over the batch;
  * images whose valid-mask coverage is < 10% of the positive-GT coverage
    are skipped (``metrics.py:26-27``); if every image is skipped the
    metric is 0.

All functions take ``(d_est, d_gt, mask)`` with shape ``(B, H, W)`` and are
jit-friendly (masking via ``where``, the skip via a weighted mean).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax

Array = jax.Array


def _per_image_mean(values: Array, mask: Array) -> Array:
    """Masked mean per image: (B, H, W) -> (B,)."""
    m = mask.astype(values.dtype)
    return jnp.sum(values * m, axis=(1, 2)) / jnp.maximum(
        jnp.sum(m, axis=(1, 2)), 1.0)


def _image_weights(d_gt: Array, mask: Array) -> Array:
    """1.0 for images that pass the degenerate-mask check, else 0."""
    mask_frac = jnp.mean(mask.astype(jnp.float32), axis=(1, 2))
    pos_frac = jnp.mean((d_gt > 0).astype(jnp.float32), axis=(1, 2))
    ratio = mask_frac / jnp.maximum(pos_frac, 1e-12)
    return (ratio >= 0.1).astype(jnp.float32)


def _batch_mean(per_image: Array, weights: Array) -> Array:
    total = jnp.sum(weights)
    return jnp.where(total > 0, jnp.sum(per_image * weights)
                     / jnp.maximum(total, 1.0), 0.0)


def epe_metric(d_est: Array, d_gt: Array, mask: Array) -> Array:
    """End-point error: masked mean |est - gt| (``metrics.py:70-74``)."""
    err = jnp.abs(d_est - d_gt)
    return _batch_mean(_per_image_mean(err, mask), _image_weights(d_gt, mask))


def d1_metric(d_est: Array, d_gt: Array, mask: Array) -> Array:
    """D1: fraction with err > 3px AND err/|gt| > 5% (``metrics.py:42-48``)."""
    err = jnp.abs(d_est - d_gt)
    bad = (err > 3.0) & (err / jnp.maximum(jnp.abs(d_gt), 1e-12) > 0.05)
    return _batch_mean(_per_image_mean(bad.astype(jnp.float32), mask),
                       _image_weights(d_gt, mask))


def d1_metric_thres(d_est: Array, d_gt: Array, mask: Array,
                    thres: float) -> Array:
    """D1 with a custom pixel threshold (``metrics.py:51-57``)."""
    err = jnp.abs(d_est - d_gt)
    bad = (err > thres) & (err / jnp.maximum(jnp.abs(d_gt), 1e-12) > 0.05)
    return _batch_mean(_per_image_mean(bad.astype(jnp.float32), mask),
                       _image_weights(d_gt, mask))


def thres_metric(d_est: Array, d_gt: Array, mask: Array,
                 thres: float) -> Array:
    """Fraction of masked pixels with err > thres (``metrics.py:60-67``)."""
    err = jnp.abs(d_est - d_gt)
    bad = (err > thres).astype(jnp.float32)
    return _batch_mean(_per_image_mean(bad, mask), _image_weights(d_gt, mask))


def eval_metrics(d_est: Array, d_gt: Array, mask: Array) -> dict[str, Array]:
    """The standard 5-metric eval bundle (``train_sceneflow.py:246-250``)."""
    return {
        "EPE": epe_metric(d_est, d_gt, mask),
        "D1": d1_metric(d_est, d_gt, mask),
        "Thres1": thres_metric(d_est, d_gt, mask, 1.0),
        "Thres2": thres_metric(d_est, d_gt, mask, 2.0),
        "Thres3": thres_metric(d_est, d_gt, mask, 3.0),
    }
