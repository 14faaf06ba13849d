"""Pytree helpers mirroring the reference's iteration utilities.

Reference: ``/root/reference/utils/experiment.py:16-56`` — in JAX these are
thin wrappers over ``jax.tree_util`` (pytrees replace the hand-rolled
list/tuple/dict recursion).
"""

from __future__ import annotations

import jax
import numpy as np


def tensor2float(tree):
    """Every array leaf -> python float (scalar leaves expected)."""
    return jax.tree_util.tree_map(lambda x: float(x), tree)


def tensor2numpy(tree):
    """Every array leaf -> numpy (device -> host)."""
    return jax.tree_util.tree_map(np.asarray, tree)


def check_allfloat(tree) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        assert isinstance(leaf, float), type(leaf)


def save_images(logger, mode_tag: str, images_dict: dict,
                global_step: int) -> None:
    """TensorBoard image dump with per-image normalisation.

    Reference semantics: ``experiment.py:80-100`` (first batch element,
    min-max normalised, name ``{mode}/{tag}[_{idx}]``). Expects HW or HWC
    numpy arrays (or lists thereof).
    """
    images_dict = tensor2numpy(images_dict)
    for tag, values in images_dict.items():
        if not isinstance(values, (list, tuple)):
            values = [values]
        for idx, value in enumerate(values):
            img = np.asarray(value, dtype=np.float32)
            if img.ndim == 4:  # batched: first element
                img = img[0]
            if img.ndim == 2:
                img = img[..., None]
            lo, hi = float(img.min()), float(img.max())
            img = (img - lo) / max(hi - lo, 1e-12)
            name = f"{mode_tag}/{tag}" + (f"_{idx}" if len(values) > 1 else "")
            # tensorboardX wants CHW
            logger.add_image(name, np.transpose(img, (2, 0, 1)), global_step)
