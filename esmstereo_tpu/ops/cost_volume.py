"""Stereo cost-volume construction ops (pure jnp reference implementations).

Semantics follow the reference cost-volume builders
(``/root/reference/models/submodule.py:105-200``) but with TPU-native layouts:

  * feature maps are NHWC ``(B, H, W, C)``
  * cost volumes are NDHWC ``(B, D, H, W, G)`` so the disparity axis is a
    spatial dim for the downstream 3-D convolutions and the group axis rides
    the TPU lane dimension.

For a disparity shift ``d``, the left (reference) pixel at column ``w``
correlates with the right (target) pixel at column ``w - d``; columns with
``w < d`` are zero. All builders here express that as a single left-pad of
the target followed by static slices, which XLA fuses into the consumer —
no gather, no dynamic shapes.

A Pallas fused kernel for the gwc/norm-correlation volumes lives in
``esmstereo_tpu.ops.pallas.correlation``; it is numerically checked against
these implementations in ``tests/test_pallas_correlation.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-5


def _shifted(tgt: Array, max_disp: int) -> list[Array]:
    """Return ``[tgt shifted right by d for d in range(max_disp)]``.

    Shifting right by ``d`` means output column ``w`` holds ``tgt[..., w-d, :]``
    (zero where ``w < d``). Implemented as one pad + static slices so XLA sees
    views of a single buffer.
    """
    w = tgt.shape[-2]
    pad = [(0, 0)] * tgt.ndim
    pad[-2] = (max_disp - 1, 0)
    padded = jnp.pad(tgt, pad)
    off = max_disp - 1
    return [
        jax.lax.slice_in_dim(padded, off - d, off - d + w, axis=-2)
        for d in range(max_disp)
    ]


def groupwise_correlation(fea1: Array, fea2: Array, num_groups: int) -> Array:
    """Per-group mean of the elementwise product. NHWC in, NHWG out.

    Reference math: ``submodule.py:143-149``.
    """
    b, h, w, c = fea1.shape
    assert c % num_groups == 0, (c, num_groups)
    cpg = c // num_groups
    f1 = fea1.reshape(b, h, w, num_groups, cpg)
    f2 = fea2.reshape(b, h, w, num_groups, cpg)
    return jnp.mean(f1 * f2, axis=-1)


def groupwise_correlation_norm(fea1: Array, fea2: Array, num_groups: int) -> Array:
    """Per-group mean of the product of per-group-L2-normalised features.

    Reference math: ``submodule.py:163-171``.
    """
    b, h, w, c = fea1.shape
    cpg = c // num_groups
    f1 = fea1.reshape(b, h, w, num_groups, cpg)
    f2 = fea2.reshape(b, h, w, num_groups, cpg)
    n1 = jnp.linalg.norm(f1, axis=-1, keepdims=True)
    n2 = jnp.linalg.norm(f2, axis=-1, keepdims=True)
    return jnp.mean((f1 / (n1 + _EPS)) * (f2 / (n2 + _EPS)), axis=-1)


def norm_correlation(fea1: Array, fea2: Array) -> Array:
    """Mean of the product of channel-L2-normalised features; keeps a G=1 axis.

    Reference math: ``submodule.py:187-189``.
    """
    n1 = jnp.linalg.norm(fea1, axis=-1, keepdims=True)
    n2 = jnp.linalg.norm(fea2, axis=-1, keepdims=True)
    return jnp.mean((fea1 / (n1 + _EPS)) * (fea2 / (n2 + _EPS)),
                    axis=-1, keepdims=True)


def groupwise_difference(fea1: Array, fea2: Array, num_groups: int) -> Array:
    """Per-group sum of squared differences. Reference: ``submodule.py:105-113``."""
    b, h, w, c = fea1.shape
    cpg = c // num_groups
    f1 = fea1.reshape(b, h, w, num_groups, cpg)
    f2 = fea2.reshape(b, h, w, num_groups, cpg)
    return jnp.sum((f1 - f2) ** 2, axis=-1)


def build_gwc_volume(ref: Array, tgt: Array, max_disp: int,
                     num_groups: int) -> Array:
    """Group-wise correlation volume ``(B, D, H, W, G)``.

    Reference semantics: ``submodule.py:151-161``. Invalid ``(d, w<d)``
    entries are zero (the zero-padded shift makes the product vanish).
    """
    per_d = [groupwise_correlation(ref, s, num_groups)
             for s in _shifted(tgt, max_disp)]
    return jnp.stack(per_d, axis=1)


def build_gwc_volume_norm(ref: Array, tgt: Array, max_disp: int,
                          num_groups: int) -> Array:
    """L2-normalised group-wise correlation volume ``(B, D, H, W, G)``.

    Reference semantics: ``submodule.py:174-184``. Normalising the zero
    padding yields ``0/(0+eps) = 0`` so invalid entries remain zero.
    """
    per_d = [groupwise_correlation_norm(ref, s, num_groups)
             for s in _shifted(tgt, max_disp)]
    return jnp.stack(per_d, axis=1)


def build_norm_correlation_volume(ref: Array, tgt: Array,
                                  max_disp: int) -> Array:
    """Channel-normalised correlation volume ``(B, D, H, W, 1)``.

    Reference semantics: ``submodule.py:191-200``.
    """
    per_d = [norm_correlation(ref, s) for s in _shifted(tgt, max_disp)]
    return jnp.stack(per_d, axis=1)


def build_subtract_volume(ref: Array, tgt: Array, max_disp: int,
                          num_groups: int) -> Array:
    """Group-wise squared-difference volume ``(B, D, H, W, G)``.

    Reference semantics: ``submodule.py:116-126``. Unlike the correlation
    volumes, ``(ref - 0)^2`` is nonzero, so invalid entries are masked
    explicitly to match the reference's untouched zeros.
    """
    b, h, w, _ = ref.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)  # (W, 1)
    per_d = []
    for d, s in enumerate(_shifted(tgt, max_disp)):
        cost = groupwise_difference(ref, s, num_groups)  # (B, H, W, G)
        valid = (cols >= d)  # (W, 1) broadcasts over (B, H, W, G)
        per_d.append(jnp.where(valid, cost, 0.0))
    return jnp.stack(per_d, axis=1)


def build_gwc_volume_folded(ref: Array, tgt: Array, max_disp: int,
                            num_groups: int) -> Array:
    """Group-wise correlation volume in the depth-folded layout
    ``(B, H, W, D*G)`` (d-major channels) — the TPU fast path that feeds
    ``nn.folded3d`` convolutions without any transpose."""
    b, h, w, _ = ref.shape
    per_d = [groupwise_correlation(ref, s, num_groups)
             for s in _shifted(tgt, max_disp)]
    return jnp.stack(per_d, axis=-2).reshape(b, h, w, max_disp * num_groups)


def build_norm_correlation_volume_folded(ref: Array, tgt: Array,
                                         max_disp: int) -> Array:
    """Channel-normalised correlation volume, folded ``(B, H, W, D)``."""
    b, h, w, _ = ref.shape
    per_d = [norm_correlation(ref, s) for s in _shifted(tgt, max_disp)]
    return jnp.stack(per_d, axis=-2).reshape(b, h, w, max_disp)


def build_concat_volume(ref: Array, tgt: Array, max_disp: int) -> Array:
    """Concatenation volume ``(B, D, H, W, 2C)``.

    Reference semantics: ``submodule.py:129-140``: the reference half is the
    unshifted left features at every disparity; the target half is shifted
    with zero fill.
    """
    per_d = [jnp.concatenate([ref, s], axis=-1)
             for s in _shifted(tgt, max_disp)]
    return jnp.stack(per_d, axis=1)
