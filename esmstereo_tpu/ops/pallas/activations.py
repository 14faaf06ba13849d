"""Mosaic-lowerable activations shared by the fused Pallas kernels.

Mosaic (Pallas TPU) has no ``erf``/``erfc`` lowering rule, so exact-erf
GELU — the reference's activation for every cost-volume conv
(``/root/reference/models/submodule.py`` BasicConv uses ``nn.GELU``) —
cannot be expressed with ``jax.nn.gelu(approximate=False)`` inside a
kernel. The compiled exact path instead uses the Abramowitz–Stegun
7.1.26 rational erf (max abs error 1.5e-7, an order below the bf16
rounding already present on the TPU matmul path; XLA's own f32 erf is
itself a rational approximation). Interpret mode keeps the stock jax
implementation so CPU parity tests compare bit-comparable graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def erf_as7126(z: Array) -> Array:
    """Abramowitz–Stegun 7.1.26 erf (f32, max abs err 1.5e-7)."""
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    return jnp.sign(z) * erf_abs


def gelu(x: Array, *, approximate: bool, interpret: bool) -> Array:
    """GELU for kernel bodies: tanh form when ``approximate`` (matches the
    deployment-precision graph set by ``nn.blocks.set_gelu_approximate``),
    else exact-erf — stock jax under ``interpret``, A&S erf compiled."""
    if approximate:
        return jax.nn.gelu(x, approximate=True)
    if interpret:
        return jax.nn.gelu(x, approximate=False)
    z = x * np.float32(2 ** -0.5)
    return 0.5 * x * (1.0 + erf_as7126(z))
