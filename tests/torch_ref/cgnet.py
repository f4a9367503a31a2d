"""Torch oracle for CGNet (ref mmseg/models/backbones/cgnet.py:13-365).

State-dict layout matches the reference exactly: ConvModule stem in a
ModuleList (``stem.{0,1,2}.{conv,bn,activate}``), ``norm_prelu_{0,1,2}``
Sequentials (bn at .0, PReLU at .1), ``level{1,2}.{j}`` ContextGuidedBlocks
(``conv1x1.{conv,bn,activate}``, bias-free ``f_loc``/``f_sur``/
``bottleneck``, joint ``bn``+``activate``, ``f_glo.fc.{0,2}``) — the keys
the production converter's CGNet rules translate. All activations are
per-channel PReLU.
"""

import torch
import torch.nn as nn


class ConvBNPReLU(nn.Module):
    """mmcv ConvModule with act PReLU (submodule key 'activate')."""

    def __init__(self, in_ch, out_ch, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride=stride,
                              padding=padding, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)
        self.activate = nn.PReLU(out_ch)

    def forward(self, x):
        return self.activate(self.bn(self.conv(x)))


class GlobalContextExtractor(nn.Module):
    """ref cgnet.py:13-50."""

    def __init__(self, channel, reduction=16):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(channel, channel // reduction), nn.ReLU(),
            nn.Linear(channel // reduction, channel), nn.Sigmoid())

    def forward(self, x):
        n, c = x.shape[:2]
        y = x.mean(dim=(2, 3))
        return x * self.fc(y).view(n, c, 1, 1)


class ContextGuidedBlock(nn.Module):
    """ref cgnet.py:53-167."""

    def __init__(self, in_channels, out_channels, dilation=2, reduction=16,
                 downsample=False):
        super().__init__()
        self.downsample = downsample
        channels = out_channels if downsample else out_channels // 2
        k = 3 if downsample else 1
        self.conv1x1 = ConvBNPReLU(in_channels, channels, k,
                                   stride=2 if downsample else 1,
                                   padding=(k - 1) // 2)
        self.f_loc = nn.Conv2d(channels, channels, 3, padding=1,
                               groups=channels, bias=False)
        self.f_sur = nn.Conv2d(channels, channels, 3, padding=dilation,
                               groups=channels, dilation=dilation,
                               bias=False)
        self.bn = nn.BatchNorm2d(2 * channels)
        self.activate = nn.PReLU(2 * channels)
        if downsample:
            self.bottleneck = nn.Conv2d(2 * channels, out_channels, 1,
                                        bias=False)
        self.f_glo = GlobalContextExtractor(out_channels, reduction)

    def forward(self, x):
        out = self.conv1x1(x)
        joi = torch.cat([self.f_loc(out), self.f_sur(out)], 1)
        joi = self.activate(self.bn(joi))
        if self.downsample:
            joi = self.bottleneck(joi)
        out = self.f_glo(joi)
        return out if self.downsample else x + out


class InputInjection(nn.Module):
    def __init__(self, num):
        super().__init__()
        self.pool = nn.ModuleList(
            [nn.AvgPool2d(3, stride=2, padding=1) for _ in range(num)])

    def forward(self, x):
        for p in self.pool:
            x = p(x)
        return x


class CGNet(nn.Module):
    """ref cgnet.py:186-365 (defaults)."""

    def __init__(self, in_channels=3, num_channels=(32, 64, 128),
                 num_blocks=(3, 21), dilations=(2, 4), reductions=(8, 16)):
        super().__init__()
        cur = in_channels
        self.stem = nn.ModuleList()
        for i in range(3):
            self.stem.append(ConvBNPReLU(cur, num_channels[0], 3,
                                         stride=2 if i == 0 else 1,
                                         padding=1))
            cur = num_channels[0]
        self.inject_2x = InputInjection(1)
        self.inject_4x = InputInjection(2)
        cur += in_channels
        self.norm_prelu_0 = nn.Sequential(nn.BatchNorm2d(cur),
                                          nn.PReLU(cur))
        self.level1 = nn.ModuleList()
        for i in range(num_blocks[0]):
            self.level1.append(ContextGuidedBlock(
                cur if i == 0 else num_channels[1], num_channels[1],
                dilations[0], reductions[0], downsample=(i == 0)))
        cur = 2 * num_channels[1] + in_channels
        self.norm_prelu_1 = nn.Sequential(nn.BatchNorm2d(cur),
                                          nn.PReLU(cur))
        self.level2 = nn.ModuleList()
        for i in range(num_blocks[1]):
            self.level2.append(ContextGuidedBlock(
                cur if i == 0 else num_channels[2], num_channels[2],
                dilations[1], reductions[1], downsample=(i == 0)))
        cur = 2 * num_channels[2]
        self.norm_prelu_2 = nn.Sequential(nn.BatchNorm2d(cur),
                                          nn.PReLU(cur))

    def forward(self, x):
        inp2, inp4 = self.inject_2x(x), self.inject_4x(x)
        for m in self.stem:
            x = m(x)
        x = self.norm_prelu_0(torch.cat([x, inp2], 1))
        outs = [x]
        for i, m in enumerate(self.level1):
            x = m(x)
            if i == 0:
                down1 = x
        x = self.norm_prelu_1(torch.cat([x, down1, inp4], 1))
        outs.append(x)
        for i, m in enumerate(self.level2):
            x = m(x)
            if i == 0:
                down2 = x
        x = self.norm_prelu_2(torch.cat([down2, x], 1))
        outs.append(x)
        return outs
