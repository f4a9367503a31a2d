"""Torch oracle for ResNetV1c-d8 (ref: mmseg/models/backbones/resnet.py).

Semantics covered: deep 3x3 stem as nn.Sequential -> state-dict keys
``stem.{0,1,3,4,6,7}`` (ref :389-416); 'pytorch' style Bottleneck (stride
on conv2, ref :126-127); per-stage strides/dilations for the d8 variant
(strides (1,2,1,1), dilations (1,1,2,4)) with ``contract_dilation``: the
first block of a dilated stage uses dilation//2
(ref models/utils/res_layer.py:67-78).
"""

import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + identity)


class ResNetV1c(nn.Module):
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
                    ds = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, blk_stride,
                                  bias=False),
                        nn.BatchNorm2d(planes * 4))
                layers.append(Bottleneck(inplanes, planes, blk_stride, dil,
                                         ds))
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


class XBottleneck(nn.Module):
    """ResNeXt Bottleneck (ref resnext.py:10-86): grouped 3x3, width =
    floor(planes * base_width / base_channels) * groups."""
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None, groups=32, base_width=4,
                 base_channels=64):
        super().__init__()
        width = (planes * base_width // base_channels) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + identity)


class ResNeXt(ResNetV1c):
    """ResNeXt-d8 with the V1c deep stem (mmseg 'resnext101_v1c' style);
    swaps XBottleneck into the V1c skeleton."""

    def __init__(self, depth=50, groups=32, base_width=4, **kwargs):
        self._groups, self._base_width = groups, base_width
        super().__init__(depth=depth, **kwargs)
        # rebuild layers with grouped bottlenecks
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
        strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        inplanes, planes = 64, 64
        for s, n in enumerate(blocks):
            stride, dilation = strides[s], dilations[s]
            layers = []
            for i in range(n):
                blk_stride = stride if i == 0 else 1
                dil = dilation // 2 if (i == 0 and dilation > 1) \
                    else dilation
                ds = None
                if i == 0 and (blk_stride != 1 or inplanes != planes * 4):
                    ds = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, blk_stride,
                                  bias=False),
                        nn.BatchNorm2d(planes * 4))
                layers.append(XBottleneck(inplanes, planes, blk_stride,
                                          dil, ds, groups=groups,
                                          base_width=base_width))
                inplanes = planes * 4
            setattr(self, f'layer{s + 1}', nn.Sequential(*layers))
            planes *= 2
