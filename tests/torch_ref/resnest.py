"""Torch oracle for ResNeSt (ref mmseg/models/backbones/resnest.py:15-314).

State-dict layout matches the reference exactly: ResNetV1d deep stem
(``stem.{0,1,3,4,6,7}``), avg_down downsamples
(``downsample.{0:pool,1:conv,2:bn}``, ref models/utils/res_layer.py:
44-62), SABottleneck ``conv1/bn1``, ``conv2.{conv,bn0,fc1,bn1,fc2}``
(SplitAttentionConv2d), ``conv3/bn3``. Defaults: radix=2,
reduction_factor=4, groups=1, avg_down_stride=True.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class SplitAttentionConv2d(nn.Module):
    """ref resnest.py:39-146 (groups=1: RSoftmax = softmax over radix)."""

    def __init__(self, in_ch, channels, k=3, stride=1, padding=0,
                 dilation=1, radix=2, reduction_factor=4):
        super().__init__()
        inter = max(in_ch * radix // reduction_factor, 32)
        self.radix, self.channels = radix, channels
        self.conv = nn.Conv2d(in_ch, channels * radix, k, stride=stride,
                              padding=padding, dilation=dilation,
                              groups=radix, bias=False)
        self.bn0 = nn.BatchNorm2d(channels * radix)
        self.fc1 = nn.Conv2d(channels, inter, 1)
        self.bn1 = nn.BatchNorm2d(inter)
        self.fc2 = nn.Conv2d(inter, channels * radix, 1)

    def forward(self, x):
        x = F.relu(self.bn0(self.conv(x)))
        b = x.size(0)
        splits = x.view(b, self.radix, -1, *x.shape[2:])
        gap = F.adaptive_avg_pool2d(splits.sum(dim=1), 1)
        gap = F.relu(self.bn1(self.fc1(gap)))
        atten = self.fc2(gap).view(b, self.radix, self.channels)
        atten = F.softmax(atten, dim=1).reshape(b, -1, 1, 1)
        attens = atten.view(b, self.radix, -1, 1, 1)
        return torch.sum(attens * splits, dim=1).contiguous()


class SABottleneck(nn.Module):
    """ref resnest.py:149-266 ('pytorch' style: stride on conv2; avd pool
    after the split-attention conv)."""
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.avd = stride > 1
        self.conv2 = SplitAttentionConv2d(
            planes, planes, 3, stride=1 if self.avd else stride,
            padding=dilation, dilation=dilation)
        if self.avd:
            self.avd_layer = nn.AvgPool2d(3, stride, padding=1)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.conv2(out)
        if self.avd:
            out = self.avd_layer(out)
        out = self.bn3(self.conv3(out))
        return F.relu(out + identity)


class ResNeSt(nn.Module):
    """V1d-d8 variant: deep stem, avg_down, strides (1,2,1,1),
    dilations (1,1,2,4), contract_dilation."""

    def __init__(self, depth=50, strides=(1, 2, 1, 1),
                 dilations=(1, 1, 2, 4), contract_dilation=True):
        super().__init__()
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, 2, 1, bias=False), nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 32, 3, 1, 1, bias=False), nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True))
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes, planes = 64, 64
        for s, n in enumerate(blocks):
            stride, dilation = strides[s], dilations[s]
            layers = []
            for i in range(n):
                blk_stride = stride if i == 0 else 1
                if i == 0 and dilation > 1 and contract_dilation:
                    dil = dilation // 2
                else:
                    dil = dilation
                ds = None
                if i == 0 and (blk_stride != 1 or inplanes != planes * 4):
                    # avg_down layout (ref res_layer.py:44-62); the pool
                    # is a kernel-1 no-op when stride == 1 but still
                    # occupies Sequential slot 0
                    ds = nn.Sequential(
                        nn.AvgPool2d(kernel_size=blk_stride,
                                     stride=blk_stride, ceil_mode=True,
                                     count_include_pad=False),
                        nn.Conv2d(inplanes, planes * 4, 1, 1, bias=False),
                        nn.BatchNorm2d(planes * 4))
                layers.append(SABottleneck(inplanes, planes, blk_stride,
                                           dil, ds))
                inplanes = planes * 4
            setattr(self, f'layer{s + 1}', nn.Sequential(*layers))
            planes *= 2

    def forward(self, x):
        x = self.maxpool(self.stem(x))
        outs = []
        for s in range(4):
            x = getattr(self, f'layer{s + 1}')(x)
            outs.append(x)
        return outs
