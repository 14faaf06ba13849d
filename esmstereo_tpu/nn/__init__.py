"""Flax module zoo (channels-last)."""

from esmstereo_tpu.nn.blocks import (
    BasicResBlock,
    Conv2x,
    ConvBlock,
    StemBlock,
    TorchConv,
    TorchConvTranspose,
    apply_act,
)
from esmstereo_tpu.nn.shufflemixer import (
    ChannelLayerNorm,
    FMBlock,
    PixelShuffleUp,
    ShuffleMixerSR,
    SMLayer,
    SplitPointMlp,
    channel_shuffle,
)

__all__ = [
    "BasicResBlock",
    "Conv2x",
    "ConvBlock",
    "StemBlock",
    "TorchConv",
    "TorchConvTranspose",
    "apply_act",
    "ChannelLayerNorm",
    "FMBlock",
    "PixelShuffleUp",
    "ShuffleMixerSR",
    "SMLayer",
    "SplitPointMlp",
    "channel_shuffle",
]
