"""Depthwise-separable FCN head (Fast-SCNN's head)
(ref contract: mmseg/models/decode_heads/sep_fcn_head.py:51LoC)."""

import flax.linen as nn
import jax.numpy as jnp

from ..builder import HEADS
from ..utils import DepthwiseSeparableConvModule
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class DepthwiseSeparableFCNHead(BaseDecodeHead):
    # inherits FCNHead's defaults (ref sep_fcn_head.py subclasses FCNHead;
    # fcn_head.py:23-25 num_convs=2, concat_input=True)
    num_convs: int = 2
    concat_input: bool = True

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        out = x
        for i in range(self.num_convs):
            out = DepthwiseSeparableConvModule(
                out_channels=self.channels, kernel_size=3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name=f'convs_{i}')(out, train=train)
        if self.concat_input:
            out = DepthwiseSeparableConvModule(
                out_channels=self.channels, kernel_size=3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name='conv_cat')(jnp.concatenate([x, out], axis=-1),
                                 train=train)
        return self.cls_seg(out, train=train)
