"""ShuffleMixer feature-mixing blocks (NHWC Flax).

Semantics mirror ``/root/reference/models/shufflemixer.py``: channel-split
point MLPs with a g=8 channel shuffle, bias-free channel LayerNorm,
depthwise spatial mixing, and the FMBlock used by the ESM upsampler. The
standalone ShuffleMixer super-resolution network (unused by ESMStereo but
part of the reference surface) is included as :class:`ShuffleMixerSR`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esmstereo_tpu.nn.blocks import TorchConv, apply_act
from esmstereo_tpu.ops.sampling import pixel_shuffle, resize_bilinear

Array = jax.Array


class _Conv1x1Params(nn.Module):
    """Owns 1x1-conv kernel+bias at the TorchConv-compatible tree path
    (<name>/Conv_0/{kernel,bias}) so PixelShuffleUp checkpoints stay
    interchangeable with the naive conv+depth-to-space formulation."""

    shape: tuple
    uinit: Any

    @nn.compact
    def __call__(self):
        return _Conv1x1Leaf(self.shape, self.uinit, name="Conv_0")()


class _Conv1x1Leaf(nn.Module):
    shape: tuple
    uinit: Any

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.uinit, tuple(self.shape))
        bias = self.param("bias", self.uinit, (self.shape[-1],))
        return kernel, bias


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis with biased variance and eps=1e-5.

    The reference flattens HW into tokens and norms over C
    (``shufflemixer.py:47-93``); in NHWC that is a plain last-axis norm.
    """

    bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,))
        # Statistics in fp32 even under a bf16 compute dtype (matches
        # flax.linen.LayerNorm's default promotion); output returns to
        # the input dtype.
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + 1e-5) * weight
        if self.bias:
            y = y + self.param("bias", nn.initializers.zeros, (dim,))
        return y.astype(x.dtype)


def channel_shuffle(x: Array, groups: int) -> Array:
    """Rearrange channels ``(g d) -> (d g)`` (``shufflemixer.py:37``).

    Implemented as a matmul with a static permutation matrix rather than a
    reshape/transpose: lane-dimension transposes lower to slow layout
    copies on TPU, while a (C, C) permutation matmul rides the MXU and
    fuses into neighbouring ops.
    """
    c = x.shape[-1]
    d = c // groups
    perm = np.empty((c,), np.int64)
    for j in range(c):
        dd, g = divmod(j, groups)
        perm[j] = g * d + dd
    p = np.zeros((c, c), np.float32)
    p[perm, np.arange(c)] = 1.0
    return jnp.einsum("...i,ij->...j", x, jnp.asarray(p, dtype=x.dtype))


class SplitPointMlp(nn.Module):
    """Half-channel point MLP followed by a g=8 channel shuffle.

    Reference: ``shufflemixer.py:23-37``.
    """

    dim: int
    mlp_ratio: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        half = self.dim // 2
        hidden = half * self.mlp_ratio
        x1, x2 = x[..., :half], x[..., half:]
        x1 = TorchConv(hidden, 1, use_bias=True, dtype=self.dtype,
                       name="fc1")(x1)
        x1 = jax.nn.silu(x1)
        x1 = TorchConv(half, 1, use_bias=True, dtype=self.dtype,
                       name="fc2")(x1)
        return channel_shuffle(jnp.concatenate([x1, x2], axis=-1), 8)


class SMLayer(nn.Module):
    """Shuffle-mixing layer: MLP -> depthwise k x k conv -> MLP with pre-norms.

    Reference: ``shufflemixer.py:97-112``. Note the spatial conv carries no
    residual of its own.
    """

    dim: int
    kernel_size: int = 7
    mlp_ratio: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = SplitPointMlp(self.dim, self.mlp_ratio, dtype=self.dtype,
                          name="mlp1")(
            ChannelLayerNorm(dtype=self.dtype, name="norm1")(x)) + x
        x = TorchConv(self.dim, self.kernel_size, 1, self.kernel_size // 2,
                      groups=self.dim, use_bias=True, dtype=self.dtype,
                      name="spatial")(x)
        x = SplitPointMlp(self.dim, self.mlp_ratio, dtype=self.dtype,
                          name="mlp2")(
            ChannelLayerNorm(dtype=self.dtype, name="norm2")(x)) + x
        return x


class FMBlock(nn.Module):
    """Feature-mixing block: 2x SMLayer + conv-SiLU bottleneck, both residual.

    Reference: ``shufflemixer.py:116-132``.
    """

    dim: int
    kernel_size: int = 7
    mlp_ratio: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = SMLayer(self.dim, self.kernel_size, self.mlp_ratio,
                    dtype=self.dtype, name="sm1")(x)
        y = SMLayer(self.dim, self.kernel_size, self.mlp_ratio,
                    dtype=self.dtype, name="sm2")(y)
        x = y + x
        z = TorchConv(self.dim + 16, 3, 1, 1, use_bias=True, dtype=self.dtype,
                      name="conv_expand")(x)
        z = jax.nn.silu(z)
        z = TorchConv(self.dim, 1, use_bias=True, dtype=self.dtype,
                      name="conv_project")(z)
        return z + x


class PixelShuffleUp(nn.Module):
    """1x1 conv -> PixelShuffle(r) -> SiLU (``ESMStereo.py:265-268`` pattern).

    Executed as an exactly-equivalent transposed conv (kernel r, stride r):
    the conv-then-depth-to-space formulation costs a lane-dim transpose
    (a slow TPU layout copy); reparameterising the same ``(1,1,Ci,Co*r^2)``
    weights into a ``(r,r,Ci,Co)`` deconv kernel produces identical values
    on the MXU with no copy. Parameters stay in the torch layout
    (checkpoint-compatible); the bias becomes the matching per-subpixel
    pattern. Equivalence is covered by tests/test_shufflemixer_fastpaths.
    """

    dim: int
    factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        r, co = self.factor, self.dim
        ci = x.shape[-1]
        fan_in = ci  # 1x1 conv fan-in
        bound = float(1.0 / np.sqrt(fan_in))

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        holder = _Conv1x1Params((1, 1, ci, co * r * r), uinit, name="conv")
        w, b = holder()

        # torch pixel-shuffle channel order is (co, ry, rx): output subpixel
        # (dy, dx) of channel c reads input channel c*r^2 + dy*r + dx.
        w2 = w[0, 0].reshape(ci, co, r, r).transpose(2, 3, 0, 1)  # (r,r,ci,co)
        dtype = self.dtype or x.dtype
        dn = jax.lax.conv_dimension_numbers(x.shape, w2.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), jnp.flip(w2, axis=(0, 1)).astype(dtype),
            (1, 1), [(r - 1, r - 1)] * 2, lhs_dilation=(r, r),
            dimension_numbers=dn)
        h, wdt = y.shape[1], y.shape[2]
        bias_pat = jnp.tile(b.reshape(co, r, r).transpose(1, 2, 0),
                            (h // r, wdt // r, 1))
        return jax.nn.silu(y + bias_pat.astype(dtype))


class ShuffleMixerSR(nn.Module):
    """Standalone ShuffleMixer super-resolution net (``shufflemixer.py:135-176``)."""

    n_feats: int = 64
    kernel_size: int = 7
    n_blocks: int = 5
    mlp_ratio: int = 2
    upscaling_factor: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        base = x
        x = TorchConv(self.n_feats, 3, 1, 1, dtype=self.dtype,
                      name="to_feat")(x)
        for i in range(self.n_blocks):
            x = FMBlock(self.n_feats, self.kernel_size, self.mlp_ratio,
                        dtype=self.dtype, name=f"block{i}")(x)
        x = PixelShuffleUp(self.n_feats, 2, dtype=self.dtype, name="up2")(x)
        x = PixelShuffleUp(self.n_feats, 2, dtype=self.dtype, name="up4")(x)
        x = TorchConv(3, 3, 1, 1, use_bias=True, dtype=self.dtype,
                      name="tail")(x)
        h, w = base.shape[1], base.shape[2]
        base = resize_bilinear(
            base, (h * self.upscaling_factor, w * self.upscaling_factor))
        return x + base
