"""Training / eval losses.

Reference semantics: ``/root/reference/models/loss.py``. Multi-scale masked
smooth-L1 with per-scale weights:

  * cv4:  [1, 1/6]        over [full, 1/2]
  * cv8:  [1, 1/6, 1/10]  over [full, 1/2, 1/4]
  * cv16: [1, 0.5] — but the reference's ``disp_gts[0:2:3]`` slice yields a
    single element, so zip truncates and only the full-res output is
    supervised (``loss.py:19``). ``fix_cv16`` restores the intended
    [full, 1/4] pairing.

Masked means are computed as ``sum(loss * mask) / max(sum(mask), 1)`` —
equivalent to the reference's boolean-indexed mean on non-empty masks and
finite (instead of NaN) on empty ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def smooth_l1(x: Array) -> Array:
    """Elementwise smooth-L1 (huber, beta=1) of a residual."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def masked_mean(values: Array, mask: Array) -> Array:
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def disparity_masks(disp_gts: list[Array], max_disp: int) -> list[Array]:
    """Validity masks ``0 < gt < max_disp`` (``train_sceneflow.py:209-212``)."""
    return [(g > 0) & (g < max_disp) for g in disp_gts]


_WEIGHTS = {4: (1.0, 1.0 / 6), 8: (1.0, 1.0 / 6, 1.0 / 10), 16: (1.0, 0.5)}


def model_loss_train(disp_ests: list[Array], disp_gts: list[Array],
                     masks: list[Array], cv_scale: int,
                     fix_cv16: bool = False) -> Array:
    """Multi-scale weighted masked smooth-L1 (``loss.py:3-22``)."""
    weights = _WEIGHTS[cv_scale]
    if cv_scale == 4:
        pairs = list(zip(disp_ests, disp_gts[0:2], weights, masks[0:2]))
    elif cv_scale == 8:
        pairs = list(zip(disp_ests, disp_gts[0:3], weights, masks[0:3]))
    else:
        if fix_cv16:
            sel = [0, 2]  # full + 1/4 (the presumed intent)
            pairs = list(zip(disp_ests, [disp_gts[i] for i in sel], weights,
                             [masks[i] for i in sel]))
        else:
            # reference quirk: [0:2:3] -> single element, zip truncates
            pairs = list(zip(disp_ests, disp_gts[0:1], weights, masks[0:1]))
    total = 0.0
    for est, gt, w, m in pairs:
        total = total + w * masked_mean(smooth_l1(est - gt), m)
    return total


def model_loss_test(disp_ests: list[Array], disp_gts: list[Array],
                    masks: list[Array]) -> Array:
    """Masked L1 on the full-res output only (``loss.py:24-29``)."""
    return masked_mean(jnp.abs(disp_ests[0] - disp_gts[0]), masks[0])
