"""Torch oracle for MobileNetV3 (seg-converted) + LRASPPHead
(ref mmseg/models/backbones/mobilenet_v3.py:15-259,
mmseg/models/decode_heads/lraspp_head.py:12-90,
mmseg/models/utils/{inverted_residual.py InvertedResidualV3,
se_layer.py}).

State-dict layout matches the reference exactly: ``layer{0..16}`` with
InvertedResidualV3 children ``expand_conv/depthwise_conv/linear_conv``
and ``se.conv1/conv2``; LRASPP ``convs.conv{i}``, ``conv_ups.conv_up{i}``,
``conv_up_input``, ``aspp_conv``, ``image_pool.1``, ``conv_seg``. The
segmentation conversion (ref :173-216) is built-in: large arch, layer7 &
layer13 stride 1, layers 7-12 dilation 2, layers 13-16 dilation 4;
layer0 uses TF-SAME (Conv2dAdaptivePadding) padding.
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
    """mmcv ConvModule layout; act in {'ReLU', 'HSwish', 'Sigmoid', None}."""

    def __init__(self, in_ch, out_ch, k, stride=1, padding=0, dilation=1,
                 groups=1, act='ReLU', bias=False, with_bn=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride=stride,
                              padding=padding, dilation=dilation,
                              groups=groups, bias=bias)
        if with_bn:
            self.bn = nn.BatchNorm2d(out_ch)
        self._bn = with_bn
        self._act = act

    def forward(self, x):
        x = self.conv(x)
        if self._bn:
            x = self.bn(x)
        if self._act == 'ReLU':
            x = F.relu(x)
        elif self._act == 'HSwish':
            x = F.hardswish(x)
        elif self._act == 'Sigmoid':
            x = torch.sigmoid(x)
        return x


class SELayer(nn.Module):
    """ref se_layer.py: 1x1 ConvModules (bias=True, no norm), HSigmoid
    gate = clip((x+3)/6, 0, 1)."""

    def __init__(self, channels, ratio=4):
        super().__init__()
        hidden = make_divisible(channels // ratio, 8)
        self.conv1 = ConvBNAct(channels, hidden, 1, act='ReLU', bias=True,
                               with_bn=False)
        self.conv2 = ConvBNAct(hidden, channels, 1, act=None, bias=True,
                               with_bn=False)

    def forward(self, x):
        y = x.mean(dim=(2, 3), keepdim=True)
        y = self.conv2(self.conv1(y))
        return x * torch.clamp((y + 3.0) / 6.0, 0.0, 1.0)


class InvertedResidualV3(nn.Module):
    """ref inverted_residual.py InvertedResidualV3 (named children)."""

    def __init__(self, in_ch, out_ch, mid_ch, k, stride=1, dilation=1,
                 with_se=False, with_expand_conv=True, act='ReLU'):
        super().__init__()
        self.use_res = stride == 1 and in_ch == out_ch
        self.with_expand_conv = with_expand_conv
        if with_expand_conv:
            self.expand_conv = ConvBNAct(in_ch, mid_ch, 1, act=act)
        # stride-2 depthwise uses Conv2dAdaptivePadding (TF-SAME,
        # ref inverted_residual.py:157-166); padding handled in forward
        self._dw_stride, self._dw_k, self._dw_dil = stride, k, dilation
        self.depthwise_conv = ConvBNAct(
            mid_ch, mid_ch, k, stride=stride,
            padding=0 if stride == 2 else dilation * (k - 1) // 2,
            dilation=dilation, groups=mid_ch, act=act)
        if with_se:
            self.se = SELayer(mid_ch)
        self._se = with_se
        self.linear_conv = ConvBNAct(mid_ch, out_ch, 1, act=None)

    def forward(self, x):
        out = x
        if self.with_expand_conv:
            out = self.expand_conv(out)
        if self._dw_stride == 2:
            s, k, d = self._dw_stride, self._dw_k, self._dw_dil
            ph = max((-(-out.shape[2] // s) - 1) * s
                     + (k - 1) * d + 1 - out.shape[2], 0)
            pw = max((-(-out.shape[3] // s) - 1) * s
                     + (k - 1) * d + 1 - out.shape[3], 0)
            out = F.pad(out, (pw // 2, pw - pw // 2,
                              ph // 2, ph - ph // 2))
        out = self.depthwise_conv(out)
        if self._se:
            out = self.se(out)
        out = self.linear_conv(out)
        return x + out if self.use_res else out


_LARGE = [(3, 16, 16, False, 'ReLU', 1), (3, 64, 24, False, 'ReLU', 2),
          (3, 72, 24, False, 'ReLU', 1), (5, 72, 40, True, 'ReLU', 2),
          (5, 120, 40, True, 'ReLU', 1), (5, 120, 40, True, 'ReLU', 1),
          (3, 240, 80, False, 'HSwish', 2), (3, 200, 80, False, 'HSwish', 1),
          (3, 184, 80, False, 'HSwish', 1), (3, 184, 80, False, 'HSwish', 1),
          (3, 480, 112, True, 'HSwish', 1), (3, 672, 112, True, 'HSwish', 1),
          (5, 672, 160, True, 'HSwish', 2), (5, 960, 160, True, 'HSwish', 1),
          (5, 960, 160, True, 'HSwish', 1)]


class MobileNetV3(nn.Module):
    """arch='large', seg-converted, out_indices=(1, 3, 16)."""

    def __init__(self, out_indices=(1, 3, 16)):
        super().__init__()
        self.out_indices = out_indices
        self.layer0 = ConvBNAct(3, 16, 3, stride=2, act='HSwish')
        in_ch = 16
        for i, (k, mid, out_ch, se, act, stride) in enumerate(_LARGE):
            n = i + 1
            dil = 2 if 7 <= n <= 12 else 4 if n >= 13 else 1
            self.add_module(f'layer{n}', InvertedResidualV3(
                in_ch, out_ch, mid, k,
                stride=1 if n in (7, 13) else stride, dilation=dil,
                with_se=se, with_expand_conv=(in_ch != mid), act=act))
            in_ch = out_ch
        self.layer16 = ConvBNAct(in_ch, 960, 1, act='HSwish')

    def forward(self, x):
        # layer0's Conv2dAdaptivePadding (TF-SAME)
        ph = max((-(-x.shape[2] // 2) - 1) * 2 + 3 - x.shape[2], 0)
        pw = max((-(-x.shape[3] // 2) - 1) * 2 + 3 - x.shape[3], 0)
        x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        outs = []
        for n in range(17):
            x = getattr(self, f'layer{n}')(x)
            if n in self.out_indices:
                outs.append(x)
        return outs


class LRASPPHead(nn.Module):
    """ref lraspp_head.py:12-90 (in_channels (16, 24, 960), channels 128,
    branch_channels (32, 64))."""

    def __init__(self, in_channels=(16, 24, 960), channels=128,
                 branch_channels=(32, 64), num_classes=19):
        super().__init__()
        self.branch_channels = branch_channels
        self.convs = nn.Sequential()
        self.conv_ups = nn.Sequential()
        for i, bc in enumerate(branch_channels):
            self.convs.add_module(
                f'conv{i}', nn.Conv2d(in_channels[i], bc, 1, bias=False))
            self.conv_ups.add_module(
                f'conv_up{i}',
                ConvBNAct(channels + bc, channels, 1, act='ReLU'))
        self.conv_up_input = nn.Conv2d(channels, channels, 1)
        self.aspp_conv = ConvBNAct(in_channels[-1], channels, 1, act='ReLU')
        # index 0 is the (param-free) AvgPool2d slot in the reference's
        # Sequential; kept as Identity so the ConvModule lands at
        # ``image_pool.1``. The pool itself runs functionally with the
        # window clamped to the input (identical to the reference's
        # AvgPool2d(49, (16, 20)) whenever H, W >= 49, where the
        # reference otherwise errors — mirrors the flax head's clamp).
        self.image_pool = nn.Sequential(
            nn.Identity(),
            ConvBNAct(in_channels[2], channels, 1, act='Sigmoid',
                      with_bn=False))
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[-1]
        win = (min(49, x.shape[2]), min(49, x.shape[3]))
        pooled = self.image_pool(F.avg_pool2d(x, win, stride=(16, 20)))
        x = self.aspp_conv(x) * F.interpolate(
            pooled, size=x.shape[2:], mode='bilinear',
            align_corners=False)
        x = self.conv_up_input(x)
        for i in range(len(self.branch_channels) - 1, -1, -1):
            x = F.interpolate(x, size=inputs[i].shape[2:], mode='bilinear',
                              align_corners=False)
            x = torch.cat([x, self.convs[i](inputs[i])], 1)
            x = self.conv_ups[i](x)
        return self.conv_seg(x)
