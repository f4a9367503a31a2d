"""Lite R-ASPP head for MobileNetV3
(ref contract: mmseg/models/decode_heads/lraspp_head.py:12-90).

Reference-faithful details: the lateral ``convs`` are bare bias-free 1x1
convs (no norm/act, ref :33-38); a biased 1x1 ``conv_up_input`` follows
the gated aspp product (:50); the image-pool gate is a 49x49 average pool
with stride (16, 20), VALID padding (:59-66) — NOT global pooling, so the
head requires its coarsest input to be at least 49x49 (inherited from the
reference; it targets 512x1024-style inputs)."""

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
        # image-pool gate: AvgPool2d(49, stride=(16, 20)) + sigmoid conv.
        # Window clamped to the input size for small inputs — where the
        # reference errors outright; identical whenever H, W >= 49.
        win = (min(49, out.shape[1]), min(49, out.shape[2]))
        gate = nn.avg_pool(out, win, strides=(16, 20), padding='VALID')
        gate = ConvModule(out_channels=self.channels, kernel_size=1,
                          bias=False, act_cfg=dict(type='Sigmoid'),
                          name='image_pool_conv')(gate, train=train)
        gate = resize(gate, size=out.shape[1:3], mode='bilinear',
                      align_corners=self.align_corners)
        out = aspp * gate
        out = nn.Conv(self.channels, (1, 1),
                      dtype=out.dtype, name='conv_up_input')(out)
        for i in range(len(x) - 2, -1, -1):
            out = resize(out, size=x[i].shape[1:3], mode='bilinear',
                         align_corners=self.align_corners)
            lateral = nn.Conv(self.branch_channels[i], (1, 1),
                              use_bias=False, dtype=x[i].dtype,
                              name=f'convs_{i}')(x[i])
            out = ConvModule(out_channels=self.channels, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name=f'conv_ups_{i}')(
                jnp.concatenate([out, lateral], axis=-1), train=train)
        return self.cls_seg(out, train=train)
