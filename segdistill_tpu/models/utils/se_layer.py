"""Squeeze-and-Excitation layer (ref contract: mmseg/models/utils/se_layer.py)."""

import flax.linen as nn
import jax.numpy as jnp

from .conv_module import ConvModule
from .misc import make_divisible


class SELayer(nn.Module):
    channels: int = None
    ratio: int = 16
    act_cfg: tuple = (dict(type='ReLU'),
                      dict(type='HSigmoid', bias=3.0, divisor=6.0))

    @nn.compact
    def __call__(self, x, train=False):
        channels = self.channels or x.shape[-1]
        out = jnp.mean(x, axis=(1, 2), keepdims=True)
        out = ConvModule(
            out_channels=make_divisible(channels // self.ratio, 8),
            kernel_size=1, act_cfg=self.act_cfg[0], name='conv1')(out, train)
        out = ConvModule(
            out_channels=channels, kernel_size=1,
            act_cfg=self.act_cfg[1], name='conv2')(out, train)
        return x * out
