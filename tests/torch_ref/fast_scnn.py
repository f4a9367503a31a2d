"""Torch oracle for Fast-SCNN (ref mmseg/models/backbones/fast_scnn.py:
13-375) + DepthwiseSeparableFCNHead (ref decode_heads/sep_fcn_head.py).

State-dict layout matches the reference exactly:
``learning_to_downsample.{conv,dsconv1,dsconv2}``,
``global_feature_extractor.{bottleneck1..3.{0..2},ppm.{0..3}.1,out}``,
``feature_fusion.{dwconv,conv_lower_res,conv_higher_res}``; the head's
``convs.{0,1}.{depthwise_conv,pointwise_conv}`` (+ ``conv_cat``) and
``conv_seg`` — the keys the production converter's Fast-SCNN rules
translate. ReLU everywhere except ReLU6 inside the InvertedResiduals.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from .mobilenet import InvertedResidual


class ConvBNReLU(nn.Module):
    """mmcv ConvModule layout (conv + bn [+ relu])."""

    def __init__(self, in_ch, out_ch, k, stride=1, padding=0, groups=1,
                 act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride=stride,
                              padding=padding, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)
        self._act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self._act else x


class DWSeparable(nn.Module):
    """mmcv DepthwiseSeparableConvModule (both halves ReLU by default)."""

    def __init__(self, in_ch, out_ch, k=3, stride=1, padding=0):
        super().__init__()
        self.depthwise_conv = ConvBNReLU(in_ch, in_ch, k, stride=stride,
                                         padding=padding, groups=in_ch)
        self.pointwise_conv = ConvBNReLU(in_ch, out_ch, 1)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class LearningToDownsample(nn.Module):
    """ref fast_scnn.py:13-71 (first conv: mmcv default padding 0)."""

    def __init__(self, in_channels, dw_channels, out_channels):
        super().__init__()
        self.conv = ConvBNReLU(in_channels, dw_channels[0], 3, stride=2)
        self.dsconv1 = DWSeparable(dw_channels[0], dw_channels[1],
                                   stride=2, padding=1)
        self.dsconv2 = DWSeparable(dw_channels[1], out_channels,
                                   stride=2, padding=1)

    def forward(self, x):
        return self.dsconv2(self.dsconv1(self.conv(x)))


class GlobalFeatureExtractor(nn.Module):
    """ref fast_scnn.py:74-179."""

    def __init__(self, in_channels=64, block_channels=(64, 96, 128),
                 out_channels=128, expand_ratio=6, strides=(2, 2, 1),
                 pool_scales=(1, 2, 3, 6)):
        super().__init__()

        def layer(in_ch, out_ch, stride):
            blocks = [InvertedResidual(in_ch, out_ch, stride, expand_ratio)]
            for _ in range(2):
                blocks.append(
                    InvertedResidual(out_ch, out_ch, 1, expand_ratio))
            return nn.Sequential(*blocks)

        self.bottleneck1 = layer(in_channels, block_channels[0], strides[0])
        self.bottleneck2 = layer(block_channels[0], block_channels[1],
                                 strides[1])
        self.bottleneck3 = layer(block_channels[1], block_channels[2],
                                 strides[2])
        self.ppm = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(s),
                          ConvBNReLU(block_channels[2],
                                     block_channels[2] // 4, 1))
            for s in pool_scales])
        self.out = ConvBNReLU(block_channels[2] * 2, out_channels, 1)

    def forward(self, x):
        x = self.bottleneck3(self.bottleneck2(self.bottleneck1(x)))
        outs = [x]
        for m in self.ppm:
            outs.append(F.interpolate(m(x), size=x.shape[2:],
                                      mode='bilinear', align_corners=False))
        return self.out(torch.cat(outs, dim=1))


class FeatureFusionModule(nn.Module):
    """ref fast_scnn.py:182-240 ('dwconv' IS a plain 1x1 ConvModule there,
    :213-220)."""

    def __init__(self, higher_in, lower_in, out_channels):
        super().__init__()
        self.dwconv = ConvBNReLU(lower_in, out_channels, 1)
        self.conv_lower_res = ConvBNReLU(out_channels, out_channels, 1,
                                         act=False)
        self.conv_higher_res = ConvBNReLU(higher_in, out_channels, 1,
                                          act=False)

    def forward(self, higher, lower):
        lower = F.interpolate(lower, size=higher.shape[2:], mode='bilinear',
                              align_corners=False)
        lower = self.conv_lower_res(self.dwconv(lower))
        return F.relu(self.conv_higher_res(higher) + lower)


class FastSCNN(nn.Module):
    """ref fast_scnn.py:250-375 (defaults of configs/_base_/models/
    fast_scnn.py)."""

    def __init__(self, in_channels=3, downsample_dw_channels=(32, 48),
                 global_in_channels=64, global_block_channels=(64, 96, 128),
                 global_block_strides=(2, 2, 1), global_out_channels=128,
                 fusion_out_channels=128):
        super().__init__()
        self.learning_to_downsample = LearningToDownsample(
            in_channels, downsample_dw_channels, global_in_channels)
        self.global_feature_extractor = GlobalFeatureExtractor(
            global_in_channels, global_block_channels, global_out_channels,
            strides=global_block_strides)
        self.feature_fusion = FeatureFusionModule(
            global_in_channels, global_out_channels, fusion_out_channels)

    def forward(self, x):
        higher = self.learning_to_downsample(x)
        lower = self.global_feature_extractor(higher)
        fusion = self.feature_fusion(higher, lower)
        return (higher, lower, fusion)


class SepFCNHead(nn.Module):
    """ref sep_fcn_head.py (FCNHead defaults num_convs=2,
    concat_input=True, kernel 3; every conv a
    DepthwiseSeparableConvModule)."""

    def __init__(self, in_ch, channels, num_classes, in_index=-1,
                 concat_input=True):
        super().__init__()
        self.in_index = in_index
        self.convs = nn.ModuleList([
            DWSeparable(in_ch, channels, padding=1),
            DWSeparable(channels, channels, padding=1)])
        self._concat = concat_input
        if concat_input:
            self.conv_cat = DWSeparable(in_ch + channels, channels,
                                        padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        out = x
        for c in self.convs:
            out = c(out)
        if self._concat:
            out = self.conv_cat(torch.cat([x, out], dim=1))
        return self.conv_seg(out)
