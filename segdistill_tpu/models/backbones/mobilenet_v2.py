"""MobileNetV2 backbone (ref contract: mmseg/models/backbones/mobilenet_v2.py:13)."""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..utils import ConvModule, InvertedResidual, make_divisible


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    strides: Sequence[int] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1)
    out_indices: Sequence[int] = (1, 2, 4, 6)
    frozen_stages: int = -1
    norm_cfg: dict = None
    norm_eval: bool = False
    pretrained: str = None
    style: str = None
    dtype: jnp.dtype = jnp.float32

    # expand_ratio, channel, num_blocks per stage (ref table)
    arch_settings = [[1, 16, 1], [6, 24, 2], [6, 32, 3], [6, 64, 4],
                     [6, 96, 3], [6, 160, 3], [6, 320, 1]]

    TAP_RENAMES = [(r'^layer(\d+)_(\d+)$', r'layer\1.\2')]

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        norm_cfg = self.norm_cfg or dict(type='BN')
        norm_train = train and not self.norm_eval
        act_cfg = dict(type='ReLU6')
        x = ConvModule(out_channels=make_divisible(32 * self.widen_factor, 8),
                       kernel_size=3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='conv1')(x, train=norm_train)
        outs = []
        for i, (expand_ratio, channel, num_blocks) in \
                enumerate(self.arch_settings):
            out_channels = make_divisible(channel * self.widen_factor, 8)
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(num_blocks):
                x = InvertedResidual(
                    out_channels=out_channels,
                    stride=stride if j == 0 else 1,
                    expand_ratio=expand_ratio, dilation=dilation,
                    norm_cfg=norm_cfg, act_cfg=act_cfg,
                    name=f'layer{i + 1}_{j}')(x, train=norm_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
