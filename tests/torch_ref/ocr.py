"""Torch oracle for OCRNet (ref mmseg/models/decode_heads/ocr_head.py
:11-127, mmseg/models/utils/self_attention_block.py:9-159,
mmseg/models/segmentors/cascade_encoder_decoder.py).

State-dict layout matches the reference exactly:
``decode_head.{0,1}`` with stage 1 = OCRHead holding ``bottleneck``,
``spatial_gather_module`` (param-free) and ``object_context_block``
(= SelfAttentionBlock children ``key_project/query_project/
value_project/out_project`` — ConvModule Sequentials when normed, bare
convs otherwise — plus its own ``bottleneck``).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvModule(nn.Module):
    def __init__(self, in_ch, out_ch, k, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _project(in_ch, channels, num_convs, use_conv_module):
    """ref self_attention_block.py:99-129."""
    if use_conv_module:
        convs = [ConvModule(in_ch, channels, 1)]
        for _ in range(num_convs - 1):
            convs.append(ConvModule(channels, channels, 1))
    else:
        convs = [nn.Conv2d(in_ch, channels, 1)]
        for _ in range(num_convs - 1):
            convs.append(nn.Conv2d(channels, channels, 1))
    return nn.Sequential(*convs) if len(convs) > 1 else convs[0]


class ObjectAttentionBlock(nn.Module):
    """ref ocr_head.py:39-81 (SelfAttentionBlock with key_query_num_convs
    2, normed projections, matmul_norm, + inner bottleneck)."""

    def __init__(self, in_channels, channels):
        super().__init__()
        self.channels = channels
        self.key_project = _project(in_channels, channels, 2, True)
        self.query_project = _project(in_channels, channels, 2, True)
        self.value_project = _project(in_channels, channels, 1, True)
        self.out_project = _project(channels, in_channels, 1, True)
        self.bottleneck = ConvModule(in_channels * 2, in_channels, 1)

    def forward(self, query_feats, key_feats):
        b = query_feats.size(0)
        query = self.query_project(query_feats)
        query = query.reshape(*query.shape[:2], -1).permute(0, 2, 1)
        key = self.key_project(key_feats).reshape(
            b, self.channels, -1)
        value = self.value_project(key_feats)
        value = value.reshape(*value.shape[:2], -1).permute(0, 2, 1)
        sim = torch.matmul(query, key) * self.channels ** -0.5
        sim = F.softmax(sim, dim=-1)
        ctx = torch.matmul(sim, value).permute(0, 2, 1).reshape(
            b, -1, *query_feats.shape[2:])
        ctx = self.out_project(ctx)
        return self.bottleneck(torch.cat([ctx, query_feats], dim=1))


class OCRHead(nn.Module):
    """ref ocr_head.py:84-127."""

    def __init__(self, in_ch, channels, ocr_channels, num_classes,
                 in_index=3, scale=1):
        super().__init__()
        self.in_index = in_index
        self.scale = scale
        self.bottleneck = ConvModule(in_ch, channels, 3, padding=1)
        self.object_context_block = ObjectAttentionBlock(channels,
                                                         ocr_channels)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs, prev_output):
        x = inputs[self.in_index]
        feats = self.bottleneck(x)
        # spatial gather (ref :11-36): softmax over pixels per class
        b, k = prev_output.shape[:2]
        c = feats.size(1)
        probs = F.softmax(self.scale * prev_output.view(b, k, -1), dim=2)
        ctx = torch.matmul(probs, feats.view(b, c, -1).permute(0, 2, 1))
        ctx = ctx.permute(0, 2, 1).unsqueeze(3)  # (B, C, K, 1)
        out = self.object_context_block(feats, ctx)
        return self.conv_seg(out)


class CascadeEncoderDecoder(nn.Module):
    """Minimal ref cascade_encoder_decoder.py: stage0 head on features,
    stage i on (features, prev logits); training loss sums every stage's
    resized CE (mean over all pixels, as in heads.EncoderDecoder)."""

    def __init__(self, backbone, heads):
        super().__init__()
        self.backbone = backbone
        self.decode_head = nn.ModuleList(heads)

    def forward(self, img):
        feats = self.backbone(img)
        out = self.decode_head[0](feats)
        for head in self.decode_head[1:]:
            out = head(feats, out)
        return out

    def _ce(self, logit, label):
        logit = F.interpolate(logit, size=label.shape[-2:],
                              mode='bilinear', align_corners=False)
        return F.cross_entropy(logit, label, ignore_index=255,
                               reduction='none').mean()

    def loss(self, img, label):
        feats = self.backbone(img)
        out = self.decode_head[0](feats)
        total = self._ce(out, label)
        for head in self.decode_head[1:]:
            out = head(feats, out)
            total = total + self._ce(out, label)
        return total
