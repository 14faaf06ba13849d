"""Pure-functional op library (jnp reference paths + Pallas TPU kernels)."""

from esmstereo_tpu.ops.cost_volume import (
    build_concat_volume,
    build_gwc_volume,
    build_gwc_volume_folded,
    build_gwc_volume_norm,
    build_norm_correlation_volume,
    build_norm_correlation_volume_folded,
    build_subtract_volume,
    groupwise_correlation,
    groupwise_correlation_norm,
    groupwise_difference,
    norm_correlation,
)
from esmstereo_tpu.ops.regression import (
    disparity_regression,
    regression_topk,
    soft_argmin,
)
from esmstereo_tpu.ops.sampling import (
    context_upsample,
    grid_sample_bilinear,
    pixel_shuffle,
    resize_bilinear,
    resize_nearest,
    unfold3x3,
    upsample2x_bilinear,
    warp,
)

__all__ = [
    "build_concat_volume",
    "build_gwc_volume",
    "build_gwc_volume_folded",
    "build_gwc_volume_norm",
    "build_norm_correlation_volume",
    "build_norm_correlation_volume_folded",
    "build_subtract_volume",
    "groupwise_correlation",
    "groupwise_correlation_norm",
    "groupwise_difference",
    "norm_correlation",
    "disparity_regression",
    "regression_topk",
    "soft_argmin",
    "context_upsample",
    "grid_sample_bilinear",
    "pixel_shuffle",
    "resize_bilinear",
    "resize_nearest",
    "unfold3x3",
    "upsample2x_bilinear",
    "warp",
]
