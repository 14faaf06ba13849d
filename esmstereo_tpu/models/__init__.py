"""Model registry (mirrors the reference ``models/__init__.py`` surface)."""

from esmstereo_tpu.models.esmstereo import (
    Aggregation3D,
    ESMStereo,
    ESMStereoConfig,
    FeatUp,
    Upsample4,
    Upsample8,
    Upsample16,
    UpRefinement,
)
from esmstereo_tpu.models.losses import (
    disparity_masks,
    masked_mean,
    model_loss_test,
    model_loss_train,
    smooth_l1,
)


def build_model(name: str, config: ESMStereoConfig):
    """Instantiate a registered model by name.

    ``ESMStereo_trt`` is the export-friendly alias: in this framework the
    single-output inference path is simply ``train_status=False`` (the
    reference needed a separate class only because of torch.onnx tracing,
    ``ESMStereo_trt.py:638,735``).
    """
    if name in ("ESMStereo", "ESMStereo_trt"):
        return ESMStereo(config=config)
    if name == "ESMStereo_confidence":
        from esmstereo_tpu.models.confidence import ESMStereoConfidence
        return ESMStereoConfidence(config=config)
    raise KeyError(f"unknown model {name!r}; have "
                   "ESMStereo, ESMStereo_trt, ESMStereo_confidence")


__models__ = {
    "ESMStereo": build_model,
    "ESMStereo_trt": build_model,
    "ESMStereo_confidence": build_model,
}

__all__ = [
    "Aggregation3D",
    "ESMStereo",
    "ESMStereoConfig",
    "FeatUp",
    "Upsample4",
    "Upsample8",
    "Upsample16",
    "UpRefinement",
    "build_model",
    "disparity_masks",
    "masked_mean",
    "model_loss_test",
    "model_loss_train",
    "smooth_l1",
    "__models__",
]
