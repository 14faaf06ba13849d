"""Running-average meters and scalar logging.

Reference semantics: ``/root/reference/utils/experiment.py:64-77,128-169``
(AverageMeter / AverageMeterDict / tensorboard scalar naming
``{mode}/{tag}_{idx}``).
"""

from __future__ import annotations

import copy
from typing import Union

Scalars = dict[str, Union[float, list[float]]]


class AverageMeter:
    def __init__(self) -> None:
        self.sum_value = 0.0
        self.count = 0

    def update(self, x: float, n: int = 1) -> None:
        self.sum_value += float(x) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum_value / max(self.count, 1)

    def mean(self) -> float:
        return self.avg


class AverageMeterDict:
    def __init__(self) -> None:
        self.data: Scalars | None = None
        self.count = 0

    def update(self, x: Scalars) -> None:
        self.count += 1
        if self.data is None:
            self.data = copy.deepcopy(
                {k: (list(v) if isinstance(v, (list, tuple)) else float(v))
                 for k, v in x.items()})
            return
        for k, v in x.items():
            if isinstance(v, (list, tuple)):
                for i, vi in enumerate(v):
                    self.data[k][i] += float(vi)
            else:
                self.data[k] += float(v)

    def mean(self) -> Scalars:
        assert self.data is not None
        return {k: ([vi / self.count for vi in v]
                    if isinstance(v, list) else v / self.count)
                for k, v in self.data.items()}


def save_scalars(logger, mode_tag: str, scalar_dict: Scalars,
                 global_step: int) -> None:
    """TensorBoard scalars with the reference's ``{mode}/{tag}_{idx}`` names."""
    for tag, values in scalar_dict.items():
        if not isinstance(values, (list, tuple)):
            values = [values]
        for idx, value in enumerate(values):
            logger.add_scalar(f"{mode_tag}/{tag}_{idx}", float(value),
                              global_step)
