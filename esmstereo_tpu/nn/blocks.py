"""Core Flax building blocks (NHWC / NDHWC).

Semantics mirror the reference block zoo (``/root/reference/models/
submodule.py:12-103``) — conv/deconv + BatchNorm + GELU units and the
upsample-and-fuse ``Conv2x`` — re-expressed as channels-last Flax modules
with torch-equivalent padding, transposed-conv arithmetic, and init.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu.nn import init as tinit
from esmstereo_tpu.ops.sampling import resize_nearest

Array = jax.Array


def _tuple(v, n: int) -> tuple[int, ...]:
    if isinstance(v, (tuple, list)):
        assert len(v) == n, (v, n)
        return tuple(v)
    return (v,) * n


# Global numerics switch: the reference uses exact-erf GELU everywhere
# (torch nn.GELU() default). The erf transcendentals cost ~3.7 ms/frame on
# the VPU at 544x960; the tanh approximation recovers that for a <1e-3
# activation difference. Parity default: exact. Enable via
# set_gelu_approximate(True) or the CLIs' --fast_gelu flag.
GELU_APPROXIMATE = False


def set_gelu_approximate(enabled: bool) -> None:
    global GELU_APPROXIMATE
    GELU_APPROXIMATE = enabled


def apply_act(x: Array, act: str | None) -> Array:
    if act is None:
        return x
    if act == "gelu":
        return jax.nn.gelu(x, approximate=GELU_APPROXIMATE)
    if act == "relu":
        return jax.nn.relu(x)
    if act == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if act == "silu":
        return jax.nn.silu(x)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(f"unknown activation {act!r}")


class TorchConv(nn.Module):
    """Convolution with torch-style symmetric padding and init.

    ``init_mode``: ``'torch'`` = torch Conv default (kaiming_uniform a=sqrt5);
    ``'msra'`` = the reference's ``weight_init`` Normal(0, sqrt(2/n_out))
    (``ESMStereo.py:25-38``); ``'kaiming_relu'`` = kaiming_normal fan_out
    (LAFNet head).
    """

    features: int
    kernel_size: Sequence[int] | int
    stride: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    dilation: Sequence[int] | int = 1
    groups: int = 1
    use_bias: bool = False
    dims: int = 2
    init_mode: str = "torch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = self.dims
        ks = _tuple(self.kernel_size, n)
        pad = [(p, p) for p in _tuple(self.padding, n)]
        kernel_init = {
            "torch": tinit.torch_conv_kernel,
            "msra": tinit.msra_out,
            "kaiming_relu": tinit.kaiming_normal_relu,
        }[self.init_mode]
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * int(np.prod(ks))
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=_tuple(self.stride, n),
            padding=pad,
            kernel_dilation=_tuple(self.dilation, n),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=tinit.torch_conv_bias(fan_in),
            dtype=self.dtype,
        )(x)


class TorchConvTranspose(nn.Module):
    """Transposed convolution with torch output arithmetic.

    Output spatial size = ``(i-1)*stride - 2*padding + kernel`` per dim,
    exactly ``nn.ConvTranspose{2,3}d(..., bias=False)``. Implemented as an
    input-dilated convolution with a spatially-flipped kernel, which XLA
    lowers to the same MXU matmuls as a forward conv.

    torch default init for transposed convs uses fan_in =
    ``out_channels * prod(kernel)`` (weight layout (in, out, *k)); the
    reference's ``weight_init`` skips ConvTranspose modules, so this is
    always the right init.
    """

    features: int
    kernel_size: Sequence[int] | int
    stride: Sequence[int] | int = 2
    padding: Sequence[int] | int = 1
    use_bias: bool = False
    dims: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = self.dims
        ks = _tuple(self.kernel_size, n)
        strides = _tuple(self.stride, n)
        pads = _tuple(self.padding, n)
        in_ch = x.shape[-1]

        fan_in = self.features * int(np.prod(ks))
        bound = float(1.0 / np.sqrt(fan_in))

        def kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kernel_init, (*ks, in_ch, self.features))
        if self.use_bias:
            bias = self.param("bias", tinit.torch_conv_bias(fan_in),
                              (self.features,))

        k_flip = jnp.flip(kernel, axis=tuple(range(n)))
        pad_cfg = [(k - 1 - p, k - 1 - p) for k, p in zip(ks, pads)]
        if n == 2:
            dn = ("NHWC", "HWIO", "NHWC")
        elif n == 3:
            dn = ("NDHWC", "DHWIO", "NDHWC")
        else:
            raise ValueError(f"dims={n}")
        dnums = jax.lax.conv_dimension_numbers(x.shape, k_flip.shape, dn)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), k_flip.astype(dtype),
            window_strides=(1,) * n,
            padding=pad_cfg,
            lhs_dilation=strides,
            dimension_numbers=dnums,
        )
        if self.use_bias:
            y = y + bias.astype(dtype)
        return y


class ConvBlock(nn.Module):
    """conv/deconv -> optional BatchNorm -> optional activation.

    The reference ``BasicConv`` (``submodule.py:12-38``): bias-free conv,
    BN(eps 1e-5, torch momentum 0.1 == flax momentum 0.9), exact GELU.
    """

    features: int
    kernel_size: Sequence[int] | int
    stride: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    dilation: Sequence[int] | int = 1
    deconv: bool = False
    dims: int = 2
    bn: bool = True
    act: str | None = "gelu"
    init_mode: str = "torch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        if self.deconv:
            x = TorchConvTranspose(
                self.features, self.kernel_size, self.stride, self.padding,
                dims=self.dims, dtype=self.dtype, name="conv")(x)
        else:
            x = TorchConv(
                self.features, self.kernel_size, self.stride, self.padding,
                self.dilation, dims=self.dims, init_mode=self.init_mode,
                dtype=self.dtype, name="conv")(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn")(x)
        return apply_act(x, self.act)


class Conv2x(nn.Module):
    """Up/down-sample ``x`` by 2, align to ``rem``, fuse, and convolve.

    Reference semantics: ``submodule.py:64-103``. With ``deconv=True`` and
    ``concat=True`` (the only configuration the reference instantiates, via
    ``FeatUp``), the output has ``2 * features`` channels.
    """

    features: int
    deconv: bool = False
    dims: int = 2
    concat: bool = True
    keep_concat: bool = True
    bn: bool = True
    act: str | None = "gelu"
    keep_dispc: bool = False
    init_mode: str = "msra"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, rem: Array, *, train: bool = False) -> Array:
        if self.deconv and self.dims == 3 and self.keep_dispc:
            kernel, stride, pad = (1, 4, 4), (1, 2, 2), (0, 1, 1)
        elif self.deconv:
            kernel, stride, pad = (4,) * self.dims, 2, 1
        else:
            kernel, stride, pad = (3,) * self.dims, 2, 1
        x = ConvBlock(self.features, kernel, stride, pad, deconv=self.deconv,
                      dims=self.dims, bn=True, act="gelu",
                      init_mode=self.init_mode, dtype=self.dtype,
                      name="conv1")(x, train=train)
        if x.shape[1:-1] != rem.shape[1:-1]:
            assert self.dims == 2, "shape fixup only defined for 2-D"
            x = resize_nearest(x, (rem.shape[1], rem.shape[2]))
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
            out = self.features * (2 if self.keep_concat else 1)
        else:
            x = x + rem
            out = self.features
        return ConvBlock(out, (3,) * self.dims, 1, 1, dims=self.dims,
                         bn=self.bn, act=self.act, init_mode=self.init_mode,
                         dtype=self.dtype, name="conv2")(x, train=train)


class BasicResBlock(nn.Module):
    """Two-conv residual block (reference ``BasicBlock``, ``submodule.py:40-61``).

    Unused by ESMStereo itself but part of the reference capability surface.
    """

    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        out = ConvBlock(self.features, 3, self.stride, self.dilation,
                        self.dilation, bn=True, act="gelu", dtype=self.dtype,
                        name="conv1")(x, train=train)
        out = ConvBlock(self.features, 3, 1, self.dilation, self.dilation,
                        bn=True, act=None, dtype=self.dtype,
                        name="conv2")(out, train=train)
        if self.downsample:
            x = ConvBlock(self.features, 1, self.stride, 0, bn=True, act=None,
                          dtype=self.dtype, name="downsample")(x, train=train)
        return out + x


class StemBlock(nn.Module):
    """Strided stem: ConvBlock(k3 s2) -> conv3x3 -> BN -> ReLU.

    Reference ``stem_*`` sequentials (``ESMStereo.py:529-583``).
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = ConvBlock(self.features, 3, 2, 1, dtype=self.dtype,
                      name="conv_down")(x, train=train)
        x = TorchConv(self.features, 3, 1, 1, dtype=self.dtype,
                      name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return jax.nn.relu(x)
