"""Backbone feature extractors."""

from esmstereo_tpu.backbones.efficientnet import (
    ARCHS,
    EFFICIENTNET_B2,
    MOBILENETV2_100,
    FeaturePyramid,
)

__all__ = ["ARCHS", "EFFICIENTNET_B2", "MOBILENETV2_100", "FeaturePyramid"]
