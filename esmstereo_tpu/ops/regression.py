"""Disparity regression ops.

Reference semantics: ``/root/reference/models/submodule.py:211-225``.

Note a deliberate reference quirk kept here: ``disparity_regression`` is a
plain weighted sum of the *raw* cost by the disparity index — the reference
applies no softmax before it (``ESMStereo.py:725,730``); the downstream
refinement stages learn around that.

Layouts: cost volumes arrive disparity-major ``(B, D, H, W)`` (squeezed
NDHWC); disparity maps are returned as NHWC images ``(B, H, W, 1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def disparity_regression(cost: Array, max_disp: int) -> Array:
    """Weighted sum of cost by disparity index over axis 1.

    Args:
      cost: ``(B, D, H, W)`` volume (probabilities or raw cost).
      max_disp: number of disparity bins ``D``.

    Returns:
      ``(B, H, W, 1)`` disparity map in bin units.
    """
    assert cost.ndim == 4 and cost.shape[1] == max_disp, cost.shape
    disp = jnp.arange(max_disp, dtype=cost.dtype).reshape(1, max_disp, 1, 1)
    return jnp.sum(cost * disp, axis=1)[..., None]


def soft_argmin(cost: Array, max_disp: int) -> Array:
    """Softmax over disparity then expectation — the classical soft-argmin.

    Provided as the numerically-sane variant of :func:`disparity_regression`
    (which the reference calls on raw cost); selectable via model config.
    """
    prob = jax.nn.softmax(cost, axis=1)
    return disparity_regression(prob, max_disp)


def regression_topk(cost: Array, disparity_samples: Array | None, k: int) -> Array:
    """Top-k softmax disparity regression.

    Picks the ``k`` highest-cost bins per pixel, softmaxes over them, and
    returns the expectation of the gathered disparity samples.
    Reference semantics: ``submodule.py:218-225``.

    Args:
      cost: ``(B, D, H, W)``.
      disparity_samples: ``(B, D, H, W)`` sample values per bin, or ``None``
        to use the bin index itself (the only use in the reference,
        ``ESMStereo.py:719-721``).
      k: number of bins to keep.

    Returns:
      ``(B, H, W, 1)`` disparity map.
    """
    cost_bhwd = jnp.moveaxis(cost, 1, -1)  # (B, H, W, D)
    topv, topi = jax.lax.top_k(cost_bhwd, k)  # (B, H, W, k)
    prob = jax.nn.softmax(topv, axis=-1)
    if disparity_samples is None:
        samples = topi.astype(cost.dtype)
    else:
        samples_bhwd = jnp.moveaxis(disparity_samples, 1, -1)
        samples = jnp.take_along_axis(samples_bhwd, topi, axis=-1)
    return jnp.sum(samples * prob, axis=-1)[..., None]
