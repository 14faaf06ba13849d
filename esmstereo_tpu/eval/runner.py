"""Shared evaluation machinery for the benchmark CLIs.

Reference conventions (``/root/reference/test_kitti.py:93-114`` etc.):
pad each image top-left up to the next /32 multiple (PIL ``crop`` with
negative offsets = zero fill), run eval-mode forward, cut the padding off
the prediction, then compute masked metrics on the original grid.

On TPU each distinct padded shape is one compiled program; shapes are
cached so a benchmark with uniform sizes compiles once.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np

from esmstereo_tpu.data.io import normalize_image


def pad_to_next_multiple(img: np.ndarray, m: int = 32) -> np.ndarray:
    """Zero-pad top/left so H and W become the NEXT multiple of ``m``
    (always grows, matching ``(w // m + 1) * m``)."""
    h, w = img.shape[:2]
    hi, wi = (h // m + 1) * m, (w // m + 1) * m
    pad = [(hi - h, 0), (wi - w, 0)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad)


class InferenceRunner:
    """Shape-cached jitted eval-mode forward."""

    def __init__(self, model, variables) -> None:
        self.model = model
        self.variables = variables
        self._compiled: dict[tuple[int, int], Callable] = {}

    def _fn(self, shape: tuple[int, int]):
        if shape not in self._compiled:
            model = self.model

            @jax.jit
            def forward(variables, left, right):
                return model.apply(variables, left, right, train=False)[0]

            self._compiled[shape] = forward
        return self._compiled[shape]

    def __call__(self, left_u8: np.ndarray, right_u8: np.ndarray
                 ) -> tuple[np.ndarray, float]:
        """uint8 HWC pair -> (disparity HxW float32, wall seconds).

        The reported time is anchored on the device-to-host transfer of
        the result (``np.asarray``), which genuinely blocks — on tunneled
        TPU platforms ``block_until_ready`` alone does not, so timing a
        bare dispatch would print fantasy per-image rates. The number thus
        includes the H2D/D2H round-trip; for pure device time use
        ``utils.profiling.chained_scan_time_ms`` (what bench.py reports).
        """
        h, w = left_u8.shape[:2]
        left = pad_to_next_multiple(normalize_image(left_u8))[None]
        right = pad_to_next_multiple(normalize_image(right_u8))[None]
        fn = self._fn(left.shape[1:3])
        t0 = time.perf_counter()
        disp = np.asarray(fn(self.variables, left, right))
        dt = time.perf_counter() - t0
        hi, wi = left.shape[1:3]
        return disp[0, hi - h:, wi - w:], dt


def load_model_for_eval(config, loadckpt: str = ""):
    """Build model + variables (optionally from a checkpoint)."""
    import jax.numpy as jnp

    from esmstereo_tpu.models import ESMStereo

    model = ESMStereo(config=config)
    dummy = jnp.zeros((1, 64, 64, 3), dtype=jnp.float32)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.key(0), l, r, train=False)
    )(dummy, dummy)
    if loadckpt:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            tree = ckptr.restore(loadckpt)
        variables = {"params": tree["params"],
                     "batch_stats": tree["batch_stats"]}
    return model, variables


def masked_epe_and_rate(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray,
                        thresh: float) -> tuple[float, float]:
    """(masked mean abs err, masked >thresh rate) — ``test_kitti.py:117-125``."""
    err = np.abs(pred * mask - gt * mask)
    rate = float(np.sum(err > thresh) / max(np.sum(mask), 1))
    epe = float(np.mean(err[mask])) if mask.any() else 0.0
    return epe, rate
