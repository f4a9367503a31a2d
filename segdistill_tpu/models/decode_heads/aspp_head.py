"""ASPP head (DeepLabV3)
(ref contract: mmseg/models/decode_heads/aspp_head.py)."""

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..utils import ConvModule, DepthwiseSeparableConvModule
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class ASPPHead(BaseDecodeHead):
    dilations: tuple = (1, 6, 12, 18)

    def _aspp_branches(self, x, train, separable=False):
        outs = []
        # image-level pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvModule(out_channels=self.channels, kernel_size=1,
                            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                            name='image_pool_conv')(pooled, train=train)
        outs.append(resize(pooled, size=x.shape[1:3], mode='bilinear',
                           align_corners=self.align_corners))
        for i, d in enumerate(self.dilations):
            if separable and d > 1:
                # DeepLabV3+ replaces dilated branches with depthwise-
                # separable convs (ref sep_aspp_head.py:10-25)
                outs.append(DepthwiseSeparableConvModule(
                    out_channels=self.channels, kernel_size=3,
                    padding=d, dilation=d, norm_cfg=self.norm_cfg,
                    act_cfg=self.act_cfg,
                    name=f'aspp_{i}')(x, train=train))
                continue
            k = 1 if d == 1 else 3
            outs.append(ConvModule(
                out_channels=self.channels, kernel_size=k,
                padding=0 if d == 1 else d, dilation=d,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name=f'aspp_{i}')(x, train=train))
        return outs

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        outs = self._aspp_branches(x, train)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate(outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)
