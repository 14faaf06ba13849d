"""Experiment utilities: metrics, meters, visualisation, profiling."""

from esmstereo_tpu.utils.meters import (
    AverageMeter,
    AverageMeterDict,
    save_scalars,
)
from esmstereo_tpu.utils.metrics import (
    d1_metric,
    d1_metric_thres,
    epe_metric,
    eval_metrics,
    thres_metric,
)
from esmstereo_tpu.utils.trees import (
    check_allfloat,
    save_images,
    tensor2float,
    tensor2numpy,
)

__all__ = [
    "AverageMeter",
    "AverageMeterDict",
    "save_scalars",
    "d1_metric",
    "d1_metric_thres",
    "epe_metric",
    "eval_metrics",
    "thres_metric",
    "check_allfloat",
    "save_images",
    "tensor2float",
    "tensor2numpy",
]
