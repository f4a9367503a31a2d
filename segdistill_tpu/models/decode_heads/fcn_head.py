"""FCN head — also the auxiliary head
(ref contract: mmseg/models/decode_heads/fcn_head.py)."""

import flax.linen as nn
import jax.numpy as jnp

from ..builder import HEADS
from ..utils import ConvModule
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class FCNHead(BaseDecodeHead):
    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        out = x
        for i in range(self.num_convs):
            out = ConvModule(out_channels=self.channels,
                             kernel_size=self.kernel_size,
                             padding=self.kernel_size // 2,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name=f'convs_{i}')(out, train=train)
        if self.num_convs == 0:
            out = x
        if self.concat_input:
            out = ConvModule(out_channels=self.channels,
                             kernel_size=self.kernel_size,
                             padding=self.kernel_size // 2,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name='conv_cat')(
                jnp.concatenate([x, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)
