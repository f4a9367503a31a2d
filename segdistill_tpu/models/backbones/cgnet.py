"""CGNet backbone (ref contract: mmseg/models/backbones/cgnet.py:186).

Context Guided blocks: local conv + dilated surrounding conv -> joint
BN+PReLU -> global context gate.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..utils import ConvModule, NormLayer


class _GlobalContext(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2))
        g = nn.relu(nn.Dense(max(c // self.reduction, 1),
                             dtype=x.dtype, name='fc1')(g))
        g = nn.sigmoid(nn.Dense(c, dtype=x.dtype, name='fc2')(g))
        return x * g[:, None, None, :]


class ContextGuidedBlock(nn.Module):
    out_channels: int
    dilation: int = 2
    reduction: int = 16
    downsample: bool = False
    norm_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        channels = self.out_channels if self.downsample \
            else self.out_channels // 2
        stride = 2 if self.downsample else 1
        ksize = 3 if self.downsample else 1
        h = ConvModule(out_channels=channels, kernel_size=ksize,
                       stride=stride, padding=ksize // 2,
                       norm_cfg=self.norm_cfg,
                       act_cfg=dict(type='LeakyReLU', negative_slope=0.01),
                       name='conv1x1')(x, train=train)
        loc = nn.Conv(channels, (3, 3), padding=1,
                      feature_group_count=channels, use_bias=False,
                      dtype=h.dtype, name='f_loc')(h)
        sur = nn.Conv(channels, (3, 3), padding=self.dilation,
                      kernel_dilation=self.dilation,
                      feature_group_count=channels, use_bias=False,
                      dtype=h.dtype, name='f_sur')(h)
        joi = jnp.concatenate([loc, sur], axis=-1)
        joi = NormLayer(self.norm_cfg, name='bn')(joi, train=train)
        joi = nn.leaky_relu(joi, negative_slope=0.01)
        if self.downsample:
            joi = ConvModule(out_channels=self.out_channels, kernel_size=1,
                             act_cfg=None, name='bottleneck')(joi,
                                                              train=train)
        out = _GlobalContext(self.reduction, name='f_glo')(joi)
        if not self.downsample:
            out = x + out
        return out


@BACKBONES.register_module()
class CGNet(nn.Module):
    in_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 128)
    num_blocks: Sequence[int] = (3, 21)
    dilations: Sequence[int] = (2, 4)
    reductions: Sequence[int] = (8, 16)
    norm_cfg: dict = None
    pretrained: str = None
    style: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        norm_cfg = self.norm_cfg or dict(type='BN')
        inp = x

        # stage 0: 3 convs stride 2 then 1, 1
        h = x
        for i, stride in enumerate([2, 1, 1]):
            h = ConvModule(out_channels=self.num_channels[0], kernel_size=3,
                           stride=stride, padding=1, norm_cfg=norm_cfg,
                           act_cfg=dict(type='LeakyReLU',
                                        negative_slope=0.01),
                           name=f'stem_{i}')(h, train=train)
        # input injection (1/2)
        inp2 = nn.avg_pool(inp, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])
        h = jnp.concatenate([h, inp2], axis=-1)
        h = NormLayer(norm_cfg, name='norm_prelu_0_bn')(h, train=train)
        h = nn.leaky_relu(h, negative_slope=0.01)
        outs = [h]

        # stage 1
        for j in range(self.num_blocks[0]):
            h = ContextGuidedBlock(self.num_channels[1],
                                   dilation=self.dilations[0],
                                   reduction=self.reductions[0],
                                   downsample=(j == 0), norm_cfg=norm_cfg,
                                   name=f'level1_{j}')(h, train=train)
        inp4 = nn.avg_pool(inp, (5, 5), strides=(4, 4),
                           padding=[(2, 2), (2, 2)])
        h = jnp.concatenate([h, inp4], axis=-1)
        h = NormLayer(norm_cfg, name='norm_prelu_1_bn')(h, train=train)
        h = nn.leaky_relu(h, negative_slope=0.01)
        outs.append(h)

        # stage 2
        for j in range(self.num_blocks[1]):
            h = ContextGuidedBlock(self.num_channels[2],
                                   dilation=self.dilations[1],
                                   reduction=self.reductions[1],
                                   downsample=(j == 0), norm_cfg=norm_cfg,
                                   name=f'level2_{j}')(h, train=train)
        h = NormLayer(norm_cfg, name='norm_prelu_2_bn')(h, train=train)
        h = nn.leaky_relu(h, negative_slope=0.01)
        outs.append(h)
        return tuple(outs)
