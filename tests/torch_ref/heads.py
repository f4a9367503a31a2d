"""Torch oracles for decode heads + a minimal EncoderDecoder container.

SegFormerHead: ref mmseg/models/decode_heads/segformer_head.py:23-98.
PSPHead/PPM:   ref mmseg/models/decode_heads/psp_head.py:10-101.
FCNHead:       ref mmseg/models/decode_heads/fcn_head.py.
ConvModule:    ref mmcv.cnn.ConvModule (conv bias off under norm; order
               conv->bn->relu).
Loss path:     ref decode_head.py:217-237 (resize logits to GT, CE,
               ignore_index=255) with SegFormerHead's reduction='none' +
               ``_parse_losses`` mean (ref segformer_head.py:45-50,
               base.py:188-192).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvModule(nn.Module):
    def __init__(self, in_ch, out_ch, k, padding=0, dilation=1):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding,
                              dilation=dilation, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class MLP(nn.Module):
    """ref segformer_head.py:23-34."""

    def __init__(self, input_dim, embed_dim):
        super().__init__()
        self.proj = nn.Linear(input_dim, embed_dim)

    def forward(self, x):
        return self.proj(x.flatten(2).transpose(1, 2))


class SegFormerHead(nn.Module):
    """ref segformer_head.py:37-98 (dropout omitted: parity uses ratio 0)."""

    def __init__(self, in_channels, embed_dim, num_classes):
        super().__init__()
        c1, c2, c3, c4 = in_channels
        self.linear_c4 = MLP(c4, embed_dim)
        self.linear_c3 = MLP(c3, embed_dim)
        self.linear_c2 = MLP(c2, embed_dim)
        self.linear_c1 = MLP(c1, embed_dim)
        self.linear_fuse = ConvModule(embed_dim * 4, embed_dim, 1)
        self.linear_pred = nn.Conv2d(embed_dim, num_classes, 1)

    def forward(self, inputs):
        c1, c2, c3, c4 = inputs
        n = c4.shape[0]
        size = c1.shape[2:]

        def embed(mlp, c):
            x = mlp(c).permute(0, 2, 1).reshape(n, -1, c.shape[2],
                                                c.shape[3])
            if c.shape[2:] != size:
                x = F.interpolate(x, size=size, mode='bilinear',
                                  align_corners=False)
            return x

        _c = self.linear_fuse(torch.cat(
            [embed(self.linear_c4, c4), embed(self.linear_c3, c3),
             embed(self.linear_c2, c2), embed(self.linear_c1, c1)], dim=1))
        return self.linear_pred(_c)


class PSPHead(nn.Module):
    """ref psp_head.py:10-101. psp_modules.{i} is Sequential(pool, ConvModule)
    -> state-dict keys ``psp_modules.{i}.1.conv/bn`` as in the reference."""

    def __init__(self, in_ch, channels, num_classes, pool_scales=(1, 2, 3, 6)):
        super().__init__()
        self.psp_modules = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(s),
                          ConvModule(in_ch, channels, 1))
            for s in pool_scales])
        self.bottleneck = ConvModule(in_ch + len(pool_scales) * channels,
                                     channels, 3, padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[-1]
        outs = [x]
        for m in self.psp_modules:
            outs.append(F.interpolate(m(x), size=x.shape[2:],
                                      mode='bilinear', align_corners=False))
        return self.conv_seg(self.bottleneck(torch.cat(outs, dim=1)))


class FCNHead(nn.Module):
    """ref fcn_head.py:10-78, fixed at the PSP aux-head configuration
    (configs/_base_/models/pspnet_r50-d8.py: num_convs=1,
    concat_input=False, in_index=2). State-dict keys ``convs.0.conv/bn``
    match the reference's nn.Sequential layout."""

    def __init__(self, in_ch, channels, num_classes, in_index=2):
        super().__init__()
        self.in_index = in_index
        self.convs = nn.ModuleList([ConvModule(in_ch, channels, 3,
                                               padding=1)])
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        for c in self.convs:
            x = c(x)
        return self.conv_seg(x)


class EncoderDecoder(nn.Module):
    """Minimal ref encoder_decoder.py: backbone -> head(s); loss = resized
    CE. ``ce_reduction='none_mean'`` reproduces SegFormerHead's
    reduction='none' + _parse_losses mean-over-all-pixels."""

    def __init__(self, backbone, decode_head, auxiliary_head=None,
                 ce_reduction='none_mean', aux_weight=0.4):
        super().__init__()
        self.backbone = backbone
        self.decode_head = decode_head
        if auxiliary_head is not None:
            self.auxiliary_head = auxiliary_head
        self._aux = auxiliary_head is not None
        self.ce_reduction = ce_reduction
        self.aux_weight = aux_weight

    def forward(self, img):
        feats = self.backbone(img)
        return self.decode_head(feats)

    def _ce(self, logit, label, weight=1.0):
        logit = F.interpolate(logit, size=label.shape[-2:], mode='bilinear',
                              align_corners=False)
        raw = F.cross_entropy(logit, label, ignore_index=255,
                              reduction='none')
        # mean over ALL pixels incl. ignored zeros — this is BOTH the
        # reference's reduction='mean' (losses/utils.py weight_reduce_loss)
        # and SegFormerHead's reduction='none' + _parse_losses mean
        # (base.py:188-192)
        return weight * raw.mean()

    def loss(self, img, label):
        feats = self.backbone(img)
        total = self._ce(self.decode_head(feats), label)
        if self._aux:
            total = total + self._ce(self.auxiliary_head(feats), label,
                                     self.aux_weight)
        return total


class UPerHead(nn.Module):
    """ref uper_head.py:11-126: PPM on the top level + FPN top-down path.
    State-dict keys: psp_modules.{i}.1.*, bottleneck, lateral_convs.{i},
    fpn_convs.{i}, fpn_bottleneck, conv_seg."""

    def __init__(self, in_channels, channels, num_classes,
                 pool_scales=(1, 2, 3, 6)):
        super().__init__()
        self.psp_modules = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(s),
                          ConvModule(in_channels[-1], channels, 1))
            for s in pool_scales])
        self.bottleneck = ConvModule(
            in_channels[-1] + len(pool_scales) * channels, channels, 3,
            padding=1)
        self.lateral_convs = nn.ModuleList(
            [ConvModule(c, channels, 1) for c in in_channels[:-1]])
        self.fpn_convs = nn.ModuleList(
            [ConvModule(channels, channels, 3, padding=1)
             for _ in in_channels[:-1]])
        self.fpn_bottleneck = ConvModule(len(in_channels) * channels,
                                         channels, 3, padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def _psp(self, x):
        outs = [x]
        for m in self.psp_modules:
            outs.append(F.interpolate(m(x), size=x.shape[2:],
                                      mode='bilinear', align_corners=False))
        return self.bottleneck(torch.cat(outs, dim=1))

    def forward(self, inputs):
        laterals = [conv(inputs[i])
                    for i, conv in enumerate(self.lateral_convs)]
        laterals.append(self._psp(inputs[-1]))
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:],
                mode='bilinear', align_corners=False)
        fpn_outs = [self.fpn_convs[i](laterals[i])
                    for i in range(len(laterals) - 1)]
        fpn_outs.append(laterals[-1])
        for i in range(len(fpn_outs) - 1, 0, -1):
            fpn_outs[i] = F.interpolate(fpn_outs[i],
                                        size=fpn_outs[0].shape[2:],
                                        mode='bilinear',
                                        align_corners=False)
        out = self.fpn_bottleneck(torch.cat(fpn_outs, dim=1))
        return self.conv_seg(out)
