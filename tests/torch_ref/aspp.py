"""Torch oracles for ASPPHead (DeepLabV3) and DepthwiseSeparableASPPHead
(DeepLabV3+) (ref mmseg/models/decode_heads/{aspp_head.py:10-110,
sep_aspp_head.py:10-103}).

State-dict layout matches the reference: ``image_pool.1`` (Sequential of
param-free pool + ConvModule), ``aspp_modules.{i}`` (plain ConvModule for
dilation 1, DepthwiseSeparableConvModule for dilation > 1 in the
separable variant), ``bottleneck``, ``c1_bottleneck``,
``sep_bottleneck.{0,1}``, ``conv_seg``.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvModule(nn.Module):
    def __init__(self, in_ch, out_ch, k, padding=0, dilation=1, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding,
                              dilation=dilation, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class DWSeparable(nn.Module):
    def __init__(self, in_ch, out_ch, k=3, padding=0, dilation=1):
        super().__init__()
        self.depthwise_conv = ConvModule(in_ch, in_ch, k, padding=padding,
                                         dilation=dilation, groups=in_ch)
        self.pointwise_conv = ConvModule(in_ch, out_ch, 1)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class ASPPHead(nn.Module):
    """ref aspp_head.py:52-110; ``separable=True`` gives the V3+ module
    swap (ref sep_aspp_head.py:10-25)."""

    def __init__(self, in_ch, channels, num_classes,
                 dilations=(1, 12, 24, 36), in_index=3, separable=False,
                 c1_in_channels=0, c1_channels=48):
        super().__init__()
        self.in_index = in_index
        self.dilations = dilations
        self.image_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), ConvModule(in_ch, channels, 1))
        mods = []
        for d in dilations:
            if separable and d > 1:
                mods.append(DWSeparable(in_ch, channels, 3, padding=d,
                                        dilation=d))
            else:
                mods.append(ConvModule(in_ch, channels,
                                       1 if d == 1 else 3,
                                       padding=0 if d == 1 else d,
                                       dilation=d))
        self.aspp_modules = nn.ModuleList(mods)
        self.bottleneck = ConvModule((len(dilations) + 1) * channels,
                                     channels, 3, padding=1)
        self._sep = separable
        self._c1 = c1_in_channels > 0
        if separable:
            if self._c1:
                self.c1_bottleneck = ConvModule(c1_in_channels, c1_channels,
                                                1)
            self.sep_bottleneck = nn.Sequential(
                DWSeparable(channels + (c1_channels if self._c1 else 0),
                            channels, 3, padding=1),
                DWSeparable(channels, channels, 3, padding=1))
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        outs = [F.interpolate(self.image_pool(x), size=x.shape[2:],
                              mode='bilinear', align_corners=False)]
        for m in self.aspp_modules:
            outs.append(m(x))
        out = self.bottleneck(torch.cat(outs, dim=1))
        if self._sep:
            if self._c1:
                c1 = self.c1_bottleneck(inputs[0])
                out = F.interpolate(out, size=c1.shape[2:],
                                    mode='bilinear', align_corners=False)
                out = torch.cat([out, c1], dim=1)
            out = self.sep_bottleneck(out)
        return self.conv_seg(out)
