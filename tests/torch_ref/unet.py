"""Torch oracle for UNet (ref mmseg/models/backbones/unet.py:13-428 +
models/utils/up_conv_block.py).

State-dict layout matches the reference exactly:
``encoder.{i}.{j}.convs.{k}.{conv,bn}`` (the stage Sequential starts
with a param-free MaxPool for pooled stages, shifting the block index),
``decoder.{i}.conv_block.convs.{k}``,
``decoder.{i}.upsample.interp_upsample.1.{conv,bn}`` (InterpConv) or
``decoder.{i}.upsample.{conv,bn}`` (no-upsample ConvModule).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvModule(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, padding=0, dilation=1):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride=stride,
                              padding=padding, dilation=dilation,
                              bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class BasicConvBlock(nn.Module):
    """ref unet.py:13-84 (first conv: stride + dilation 1)."""

    def __init__(self, in_ch, out_ch, num_convs=2, stride=1, dilation=1):
        super().__init__()
        convs = []
        for i in range(num_convs):
            convs.append(ConvModule(
                in_ch if i == 0 else out_ch, out_ch, 3,
                stride=stride if i == 0 else 1,
                dilation=1 if i == 0 else dilation,
                padding=1 if i == 0 else dilation))
        self.convs = nn.Sequential(*convs)

    def forward(self, x):
        return self.convs(x)


class InterpConv(nn.Module):
    """ref unet.py:148-218 (upsample-then-conv, scale 2 bilinear)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.interp_upsample = nn.Sequential(
            nn.Upsample(scale_factor=2, mode='bilinear',
                        align_corners=False),
            ConvModule(in_ch, out_ch, 1))

    def forward(self, x):
        return self.interp_upsample(x)


class UpConvBlock(nn.Module):
    """ref up_conv_block.py:6-101."""

    def __init__(self, in_ch, skip_ch, out_ch, num_convs=2, dilation=1,
                 upsample=True):
        super().__init__()
        self.conv_block = BasicConvBlock(2 * skip_ch, out_ch,
                                         num_convs=num_convs,
                                         dilation=dilation)
        if upsample:
            self.upsample = InterpConv(in_ch, skip_ch)
        else:
            self.upsample = ConvModule(in_ch, skip_ch, 1)

    def forward(self, skip, x):
        x = self.upsample(x)
        return self.conv_block(torch.cat([skip, x], dim=1))


class UNet(nn.Module):
    """ref unet.py:222-428 (defaults: S5, all-pool downsampling)."""

    def __init__(self, in_channels=3, base_channels=64, num_stages=5,
                 strides=(1, 1, 1, 1, 1), enc_num_convs=(2, 2, 2, 2, 2),
                 dec_num_convs=(2, 2, 2, 2),
                 downsamples=(True, True, True, True),
                 enc_dilations=(1, 1, 1, 1, 1),
                 dec_dilations=(1, 1, 1, 1)):
        super().__init__()
        self.encoder = nn.ModuleList()
        self.decoder = nn.ModuleList()
        in_ch = in_channels
        for i in range(num_stages):
            enc = []
            if i != 0:
                if strides[i] == 1 and downsamples[i - 1]:
                    enc.append(nn.MaxPool2d(kernel_size=2))
                self.decoder.append(UpConvBlock(
                    base_channels * 2 ** i, base_channels * 2 ** (i - 1),
                    base_channels * 2 ** (i - 1),
                    num_convs=dec_num_convs[i - 1],
                    dilation=dec_dilations[i - 1],
                    upsample=(strides[i] != 1 or downsamples[i - 1])))
            enc.append(BasicConvBlock(in_ch, base_channels * 2 ** i,
                                      num_convs=enc_num_convs[i],
                                      stride=strides[i],
                                      dilation=enc_dilations[i]))
            self.encoder.append(nn.Sequential(*enc))
            in_ch = base_channels * 2 ** i

    def forward(self, x):
        enc_outs = []
        for enc in self.encoder:
            x = enc(x)
            enc_outs.append(x)
        dec_outs = [x]
        for i in reversed(range(len(self.decoder))):
            x = self.decoder[i](enc_outs[i], x)
            dec_outs.append(x)
        return dec_outs
