"""Torch oracles for the FPN neck (ref mmseg/models/necks/fpn.py:9-212)
and FPNHead (ref decode_heads/fpn_head.py:10-69).

State-dict layout matches the reference: neck ``lateral_convs.{i}.conv``
(1x1, bias, no norm/act) + ``fpn_convs.{i}.conv`` (3x3, act None);
head ``scale_heads.{i}.{2k}`` ConvModules interleaved with param-free
Upsamples.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvModule(nn.Module):
    def __init__(self, in_ch, out_ch, k, padding=0, with_bn=True,
                 act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding,
                              bias=not with_bn)
        if with_bn:
            self.bn = nn.BatchNorm2d(out_ch)
        self._bn, self._act = with_bn, act

    def forward(self, x):
        x = self.conv(x)
        if self._bn:
            x = self.bn(x)
        return F.relu(x) if self._act else x


class FPN(nn.Module):
    """ref necks/fpn.py (no norm, act None — the mmseg default)."""

    def __init__(self, in_channels, out_channels, num_outs):
        super().__init__()
        self.num_outs = num_outs
        self.lateral_convs = nn.ModuleList(
            [ConvModule(c, out_channels, 1, with_bn=False, act=False)
             for c in in_channels])
        self.fpn_convs = nn.ModuleList(
            [ConvModule(out_channels, out_channels, 3, padding=1,
                        with_bn=False, act=False)
             for _ in in_channels])

    def forward(self, inputs):
        laterals = [conv(inputs[i])
                    for i, conv in enumerate(self.lateral_convs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:],
                mode='nearest')
        outs = [self.fpn_convs[i](laterals[i])
                for i in range(len(laterals))]
        for _ in range(self.num_outs - len(outs)):
            outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


class FPNHead(nn.Module):
    """ref fpn_head.py:10-69."""

    def __init__(self, in_channels, channels, num_classes,
                 feature_strides=(4, 8, 16, 32)):
        super().__init__()
        import numpy as np
        self.feature_strides = feature_strides
        self.scale_heads = nn.ModuleList()
        for i, stride in enumerate(feature_strides):
            head_len = max(1, int(np.log2(stride)
                                  - np.log2(feature_strides[0])))
            mods = []
            for k in range(head_len):
                mods.append(ConvModule(
                    in_channels[i] if k == 0 else channels, channels, 3,
                    padding=1))
                if stride != feature_strides[0]:
                    mods.append(nn.Upsample(scale_factor=2,
                                            mode='bilinear',
                                            align_corners=False))
            self.scale_heads.append(nn.Sequential(*mods))
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        out = self.scale_heads[0](inputs[0])
        for i in range(1, len(self.feature_strides)):
            out = out + F.interpolate(
                self.scale_heads[i](inputs[i]), size=out.shape[2:],
                mode='bilinear', align_corners=False)
        return self.conv_seg(out)
