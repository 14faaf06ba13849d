"""Weight initialisers matching the reference's training dynamics.

Two init families appear in the reference:

  * ``SubModule.weight_init`` (``ESMStereo.py:25-38``): conv weights ~
    Normal(0, sqrt(2/n)) with ``n = prod(kernel) * out_channels``; BN gamma=1,
    beta=0.
  * torch defaults everywhere else: Conv2d/3d use kaiming_uniform(a=sqrt(5)),
    which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with
    ``fan_in = in_channels * prod(kernel)``; bias likewise.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def msra_out(key, shape, dtype=jnp.float32):
    """Normal(0, sqrt(2/n)) with n = prod(kernel) * out_channels.

    Kernel shape convention here is ``(*spatial, in, out)`` (HWIO / DHWIO).
    """
    n = int(np.prod(shape[:-2])) * shape[-1]
    std = float(np.sqrt(2.0 / n))
    return std * jax.random.normal(key, shape, dtype)


def torch_conv_kernel(key, shape, dtype=jnp.float32):
    """torch Conv default: U(-b, b), b = 1/sqrt(in_channels * prod(kernel))."""
    fan_in = int(np.prod(shape[:-2])) * shape[-2]
    bound = float(1.0 / np.sqrt(fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias(fan_in: int):
    bound = float(1.0 / np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_relu(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu').

    Used by the LAFNet confidence head init
    (``ESMStereo_confidence.py:634-642``).
    """
    fan_out = int(np.prod(shape[:-2])) * shape[-1]
    std = float(np.sqrt(2.0 / fan_out))
    return std * jax.random.normal(key, shape, dtype)
