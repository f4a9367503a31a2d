"""Fast-SCNN backbone (ref contract: mmseg/models/backbones/fast_scnn.py:250).

Structure per the reference:

* LearningToDownsample (:13-71): 3x3 s2 ConvModule with mmcv's default
  padding 0 (odd feature sizes are part of the contract), then two
  3x3 s2 p1 DepthwiseSeparableConvModules -> 'higher' features (1/8).
* GlobalFeatureExtractor (:74-179): 3 groups x 3 MobileNetV2
  InvertedResiduals (ReLU6), strides (2,2,1); PPM(1,2,3,6); concat;
  1x1 out ConvModule -> 'lower' features.
* FeatureFusionModule (:182-240): lower is bilinear-resized to higher's
  size, through a 1x1 ConvModule ('dwconv' — the reference names it that
  but it IS a plain 1x1, :213-220) + a 1x1 act-free ConvModule; higher
  through a 1x1 act-free ConvModule; ReLU(sum).
"""

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
    act_cfg: dict = None
    align_corners: bool = False
    pretrained: str = None
    style: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')

        # learning-to-downsample (1/8); first conv has mmcv's default
        # padding 0 (ref :43-50)
        x = ConvModule(out_channels=self.downsample_dw_channels[0],
                       kernel_size=3, stride=2, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='ld_conv')(x, train=train)
        x = DepthwiseSeparableConvModule(
            out_channels=self.downsample_dw_channels[1], kernel_size=3,
            stride=2, padding=1, norm_cfg=norm_cfg,
            name='ld_dsconv1')(x, train=train)
        higher = DepthwiseSeparableConvModule(
            out_channels=self.global_in_channels, kernel_size=3, stride=2,
            padding=1, norm_cfg=norm_cfg, name='ld_dsconv2')(x, train=train)

        # global feature extractor (1/32) + PPM (ref :122-178)
        g = higher
        for bi, (ch, stride) in enumerate(zip(self.global_block_channels,
                                              self.global_block_strides)):
            for j in range(3):
                g = InvertedResidual(out_channels=ch,
                                     stride=stride if j == 0 else 1,
                                     expand_ratio=6, norm_cfg=norm_cfg,
                                     name=f'bottleneck{bi + 1}_{j}')(
                                         g, train=train)
        ppm_outs = [g] + PPM((1, 2, 3, 6),
                             self.global_block_channels[2] // 4,
                             norm_cfg=norm_cfg, act_cfg=act_cfg,
                             align_corners=self.align_corners,
                             name='ppm')(g, train=train)
        lower = ConvModule(out_channels=self.global_out_channels,
                           kernel_size=1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name='gfe_out')(
            jnp.concatenate(ppm_outs, axis=-1), train=train)

        # feature fusion (ref :182-240)
        up = resize(lower, size=higher.shape[1:3], mode='bilinear',
                    align_corners=self.align_corners)
        up = ConvModule(out_channels=self.fusion_out_channels,
                        kernel_size=1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                        name='ffm_dwconv')(up, train=train)
        up = ConvModule(out_channels=self.fusion_out_channels,
                        kernel_size=1, norm_cfg=norm_cfg, act_cfg=None,
                        name='ffm_conv_lower')(up, train=train)
        hi = ConvModule(out_channels=self.fusion_out_channels,
                        kernel_size=1, norm_cfg=norm_cfg, act_cfg=None,
                        name='ffm_conv_higher')(higher, train=train)
        fusion = nn.relu(hi + up)
        outs = [higher, lower, fusion]
        return tuple(outs[i] for i in self.out_indices)
