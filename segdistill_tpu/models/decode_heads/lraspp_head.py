"""Lite R-ASPP head for MobileNetV3
(ref contract: mmseg/models/decode_heads/lraspp_head.py:90LoC)."""

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..utils import ConvModule
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class LRASPPHead(BaseDecodeHead):
    branch_channels: tuple = (32, 64)
    input_transform: str = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        # x: list of progressively coarser features; last drives the aspp
        out = x[-1]
        aspp = ConvModule(out_channels=self.channels, kernel_size=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='aspp_conv')(out, train=train)
        # image-pool gate (49x49 avgpool stride 16..20 in torch; global
        # pooling is the standard simplification at seg resolutions)
        gate = jnp.mean(out, axis=(1, 2), keepdims=True)
        gate = ConvModule(out_channels=self.channels, kernel_size=1,
                          act_cfg=dict(type='Sigmoid'),
                          name='image_pool_conv')(gate, train=train)
        out = aspp * gate
        for i in range(len(x) - 2, -1, -1):
            out = resize(out, size=x[i].shape[1:3], mode='bilinear',
                         align_corners=self.align_corners)
            lateral = ConvModule(out_channels=self.branch_channels[i],
                                 kernel_size=1, norm_cfg=self.norm_cfg,
                                 act_cfg=self.act_cfg,
                                 name=f'convs_{i}')(x[i], train=train)
            out = ConvModule(out_channels=self.channels, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name=f'conv_ups_{i}')(
                jnp.concatenate([out, lateral], axis=-1), train=train)
        return self.cls_seg(out, train=train)
