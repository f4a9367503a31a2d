"""Fast-SCNN backbone (ref contract: mmseg/models/backbones/fast_scnn.py:250)."""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import BACKBONES
from ..utils import ConvModule, DepthwiseSeparableConvModule, InvertedResidual
from ..decode_heads.psp_head import PPM


@BACKBONES.register_module()
class FastSCNN(nn.Module):
    in_channels: int = 3
    downsample_dw_channels: Sequence[int] = (32, 48)
    global_in_channels: int = 64
    global_block_channels: Sequence[int] = (64, 96, 128)
    global_block_strides: Sequence[int] = (2, 2, 1)
    global_out_channels: int = 128
    higher_in_channels: int = 64
    lower_in_channels: int = 128
    fusion_out_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2)
    norm_cfg: dict = None
    align_corners: bool = False
    pretrained: str = None
    style: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        norm_cfg = self.norm_cfg or dict(type='BN')

        # learning-to-downsample (1/8)
        x = ConvModule(out_channels=self.downsample_dw_channels[0],
                       kernel_size=3, stride=2, padding=1,
                       norm_cfg=norm_cfg, name='ld_conv')(x, train=train)
        x = DepthwiseSeparableConvModule(
            out_channels=self.downsample_dw_channels[1], kernel_size=3,
            stride=2, padding=1, norm_cfg=norm_cfg,
            name='ld_dsconv1')(x, train=train)
        higher = DepthwiseSeparableConvModule(
            out_channels=self.global_in_channels, kernel_size=3, stride=2,
            padding=1, norm_cfg=norm_cfg, name='ld_dsconv2')(x, train=train)

        # global feature extractor (1/32) + PPM
        g = higher
        for bi, (ch, stride) in enumerate(zip(self.global_block_channels,
                                              self.global_block_strides)):
            for j in range(3):
                g = InvertedResidual(out_channels=ch,
                                     stride=stride if j == 0 else 1,
                                     expand_ratio=6, norm_cfg=norm_cfg,
                                     name=f'gfe_{bi}_{j}')(g, train=train)
        ppm_outs = [g] + PPM((1, 2, 3, 6), self.global_out_channels // 4,
                             norm_cfg=norm_cfg,
                             align_corners=self.align_corners,
                             name='ppm')(g, train=train)
        lower = ConvModule(out_channels=self.global_out_channels,
                           kernel_size=3, padding=1, norm_cfg=norm_cfg,
                           name='gfe_out')(
            jnp.concatenate(ppm_outs, axis=-1), train=train)

        # feature fusion
        up = resize(lower, size=higher.shape[1:3], mode='bilinear',
                    align_corners=self.align_corners)
        up = DepthwiseSeparableConvModule(
            out_channels=self.fusion_out_channels, kernel_size=3,
            padding=1, norm_cfg=norm_cfg, dw_act_cfg=None,
            name='ffm_dwconv')(up, train=train)
        up = ConvModule(out_channels=self.fusion_out_channels,
                        kernel_size=1, norm_cfg=norm_cfg, act_cfg=None,
                        name='ffm_conv_lower')(up, train=train)
        hi = ConvModule(out_channels=self.fusion_out_channels,
                        kernel_size=1, norm_cfg=norm_cfg, act_cfg=None,
                        name='ffm_conv_higher')(higher, train=train)
        fusion = nn.relu(hi + up)
        return (higher, lower, fusion)
