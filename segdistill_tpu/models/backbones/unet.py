"""UNet backbone (ref contract: mmseg/models/backbones/unet.py:13-428,
models/utils/up_conv_block.py).

Reference semantics: each BasicConvBlock's FIRST conv carries the stage
stride and always dilation 1/padding 1; later convs use the stage
dilation (ref unet.py:60-74). Encoder stage i>0 max-pools only when
``strides[i] == 1 and downsamples[i-1]`` — a stride-2 first conv
replaces the pool otherwise (:338-341). The decoder's InterpConv is a
2x bilinear upsample followed by a 1x1 ConvModule (:148-218); when the
matching encoder stage neither strided nor pooled, the upsample module
degenerates to a plain 1x1 ConvModule (up_conv_block.py:76-92).
Outputs are [bottleneck, decoder stages coarse->fine] (:375-386).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import BACKBONES
from ..utils import ConvModule


class _ConvBlock(nn.Module):
    channels: int
    num_convs: int
    stride: int = 1
    dilation: int = 1
    norm_cfg: dict = None
    act_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.num_convs):
            x = ConvModule(out_channels=self.channels, kernel_size=3,
                           stride=self.stride if i == 0 else 1,
                           dilation=1 if i == 0 else self.dilation,
                           padding=1 if i == 0 else self.dilation,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name=f'convs_{i}')(x, train=train)
        return x


@BACKBONES.register_module()
class UNet(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 5
    strides: Sequence[int] = (1, 1, 1, 1, 1)
    enc_num_convs: Sequence[int] = (2, 2, 2, 2, 2)
    dec_num_convs: Sequence[int] = (2, 2, 2, 2)
    downsamples: Sequence[bool] = (True, True, True, True)
    enc_dilations: Sequence[int] = (1, 1, 1, 1, 1)
    dec_dilations: Sequence[int] = (1, 1, 1, 1)
    norm_cfg: dict = None
    act_cfg: dict = None
    upsample_cfg: dict = None
    norm_eval: bool = False
    pretrained: str = None
    style: str = None
    # accepted for config parity (ref _base_/models/*_unet_s5-d16.py):
    # conv_cfg is always None in the reference corpus; with_cp (torch
    # activation checkpointing) maps to remat, which the runner applies
    # globally to the teacher — per-block remat is not needed here.
    conv_cfg: dict = None
    with_cp: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        train = train and not self.norm_eval

        enc_outs = []
        for i in range(self.num_stages):
            if i > 0 and self.strides[i] == 1 and self.downsamples[i - 1]:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = _ConvBlock(self.base_channels * 2 ** i,
                           self.enc_num_convs[i],
                           stride=self.strides[i],
                           dilation=self.enc_dilations[i],
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'encoder_{i}')(x, train=train)
            enc_outs.append(x)

        outs = [enc_outs[-1]]
        d = enc_outs[-1]
        for i in range(self.num_stages - 2, -1, -1):
            skip = enc_outs[i]
            upsampled = (self.strides[i + 1] != 1 or self.downsamples[i])
            if upsampled:
                d = resize(d, size=skip.shape[1:3], mode='bilinear',
                           align_corners=False)
            d = ConvModule(out_channels=skip.shape[-1], kernel_size=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'up_conv_{i}')(d, train=train)
            d = _ConvBlock(self.base_channels * 2 ** i,
                           self.dec_num_convs[i],
                           dilation=self.dec_dilations[i],
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'decoder_{i}')(
                jnp.concatenate([skip, d], axis=-1), train=train)
            outs.append(d)
        return tuple(outs)
