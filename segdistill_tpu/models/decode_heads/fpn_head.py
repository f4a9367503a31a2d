"""Panoptic-FPN style head (ref contract: mmseg/models/decode_heads/fpn_head.py:69LoC)."""

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..utils import ConvModule
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class FPNHead(BaseDecodeHead):
    feature_strides: tuple = (4, 8, 16, 32)
    input_transform: str = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        outs = []
        import math
        for i, stride in enumerate(self.feature_strides):
            head_len = max(1, int(math.log2(stride)
                                  - math.log2(self.feature_strides[0])))
            h = x[i]
            for k in range(head_len):
                h = ConvModule(out_channels=self.channels, kernel_size=3,
                               padding=1, norm_cfg=self.norm_cfg,
                               act_cfg=self.act_cfg,
                               name=f'scale_heads_{i}_{k}')(h, train=train)
                if stride != self.feature_strides[0]:
                    h = resize(h, scale_factor=2.0, mode='bilinear',
                               align_corners=self.align_corners)
            outs.append(h)
        out = outs[0]
        for i in range(1, len(outs)):
            out = out + resize(outs[i], size=out.shape[1:3],
                               mode='bilinear',
                               align_corners=self.align_corners)
        return self.cls_seg(out, train=train)
