"""Depthwise-separable ASPP head (DeepLabV3+)
(ref contract: mmseg/models/decode_heads/sep_aspp_head.py)."""

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..utils import ConvModule, DepthwiseSeparableConvModule
from .aspp_head import ASPPHead


@HEADS.register_module()
class DepthwiseSeparableASPPHead(ASPPHead):
    c1_in_channels: int = 0
    c1_channels: int = 48

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        outs = self._aspp_branches(x, train, separable=True)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate(outs, axis=-1), train=train)
        if self.c1_in_channels > 0:
            c1 = ConvModule(out_channels=self.c1_channels, kernel_size=1,
                            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                            name='c1_bottleneck')(inputs[0], train=train)
            out = resize(out, size=c1.shape[1:3], mode='bilinear',
                         align_corners=self.align_corners)
            out = jnp.concatenate([out, c1], axis=-1)
        out = DepthwiseSeparableConvModule(
            out_channels=self.channels, kernel_size=3, padding=1,
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='sep_conv1')(out, train=train)
        out = DepthwiseSeparableConvModule(
            out_channels=self.channels, kernel_size=3, padding=1,
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='sep_conv2')(out, train=train)
        return self.cls_seg(out, train=train)
