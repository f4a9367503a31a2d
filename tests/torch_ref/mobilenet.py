"""Torch oracle for MobileNetV2 (ref mmseg/models/backbones/
mobilenet_v2.py:13-157 + mmseg/models/utils/inverted_residual.py:8-92).

State-dict layout matches the reference exactly: the stem ConvModule is
``conv1`` and every InvertedResidual keeps its blocks in an
``nn.Sequential`` named ``conv`` (keys ``layerN.M.conv.{0,1,2}.conv/bn``)
— the layout the production converter's MNv2 rules translate. ReLU6
activations; the linear (last) 1x1 has no activation.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def make_divisible(value, divisor=8):
    new = max(divisor, int(value + divisor / 2) // divisor * divisor)
    if new < 0.9 * value:
        new += divisor
    return new


class ConvBNAct(nn.Module):
    """mmcv ConvModule state-dict shape (conv + bn [+ relu6])."""

    def __init__(self, in_ch, out_ch, k, stride=1, padding=0, dilation=1,
                 groups=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride=stride,
                              padding=padding, dilation=dilation,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)
        self._act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu6(x) if self._act else x


class InvertedResidual(nn.Module):
    """ref inverted_residual.py:49-92 (Sequential 'conv')."""

    def __init__(self, in_ch, out_ch, stride, expand_ratio, dilation=1):
        super().__init__()
        self.use_res = stride == 1 and in_ch == out_ch
        hidden = int(round(in_ch * expand_ratio))
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNAct(in_ch, hidden, 1))
        layers.append(ConvBNAct(hidden, hidden, 3, stride=stride,
                                padding=dilation, dilation=dilation,
                                groups=hidden))
        layers.append(ConvBNAct(hidden, out_ch, 1, act=False))
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


class MobileNetV2(nn.Module):
    arch_settings = [[1, 16, 1], [6, 24, 2], [6, 32, 3], [6, 64, 4],
                     [6, 96, 3], [6, 160, 3], [6, 320, 1]]

    def __init__(self, widen_factor=1.0, strides=(1, 2, 2, 2, 1, 2, 1),
                 dilations=(1, 1, 1, 1, 1, 1, 1), out_indices=(1, 2, 4, 6)):
        super().__init__()
        self.out_indices = out_indices
        in_ch = make_divisible(32 * widen_factor, 8)
        self.conv1 = ConvBNAct(3, in_ch, 3, stride=2, padding=1)
        self.layer_names = []
        for i, (expand, channel, num_blocks) in \
                enumerate(self.arch_settings):
            out_ch = make_divisible(channel * widen_factor, 8)
            blocks = []
            for j in range(num_blocks):
                blocks.append(InvertedResidual(
                    in_ch, out_ch, strides[i] if j == 0 else 1, expand,
                    dilation=dilations[i]))
                in_ch = out_ch
            name = f'layer{i + 1}'
            self.add_module(name, nn.Sequential(*blocks))
            self.layer_names.append(name)

    def forward(self, x):
        x = self.conv1(x)
        outs = []
        for i, name in enumerate(self.layer_names):
            x = getattr(self, name)(x)
            if i in self.out_indices:
                outs.append(x)
        return outs
