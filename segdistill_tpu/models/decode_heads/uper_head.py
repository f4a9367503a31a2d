"""UPerHead: PPM + FPN top-down fusion (Swin's decode head)
(ref contract: mmseg/models/decode_heads/uper_head.py:11-126)."""

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..utils import ConvModule
from .decode_head import BaseDecodeHead
from .psp_head import PPM


@HEADS.register_module()
class UPerHead(BaseDecodeHead):
    pool_scales: tuple = (1, 2, 3, 6)
    input_transform: str = 'multiple_select'  # ref uper_head.py:28

    @nn.compact
    def __call__(self, inputs, train=False):
        inputs = self._transform_inputs(inputs)  # multiple_select

        # PSP on the last (coarsest) feature
        x = inputs[-1]
        psp_outs = [x] + PPM(self.pool_scales, self.channels,
                             conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                             act_cfg=self.act_cfg,
                             align_corners=self.align_corners,
                             name='psp_modules')(x, train=train)
        psp_out = ConvModule(out_channels=self.channels, kernel_size=3,
                             padding=1, norm_cfg=self.norm_cfg,
                             act_cfg=self.act_cfg, name='psp_bottleneck')(
            jnp.concatenate(psp_outs, axis=-1), train=train)

        # lateral 1x1 convs on all but the last input
        laterals = []
        for i in range(len(inputs) - 1):
            laterals.append(ConvModule(
                out_channels=self.channels, kernel_size=1,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name=f'lateral_convs_{i}')(inputs[i], train=train))
        laterals.append(psp_out)

        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], size=laterals[i - 1].shape[1:3],
                mode='bilinear', align_corners=self.align_corners)

        # fpn convs on each fused level (last level = psp_out untouched)
        fpn_outs = []
        for i in range(len(laterals) - 1):
            fpn_outs.append(ConvModule(
                out_channels=self.channels, kernel_size=3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name=f'fpn_convs_{i}')(laterals[i], train=train))
        fpn_outs.append(laterals[-1])

        for i in range(1, len(fpn_outs)):
            fpn_outs[i] = resize(fpn_outs[i], size=fpn_outs[0].shape[1:3],
                                 mode='bilinear',
                                 align_corners=self.align_corners)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='fpn_bottleneck')(
            jnp.concatenate(fpn_outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)
